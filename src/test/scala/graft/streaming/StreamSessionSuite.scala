package graft.streaming

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** [[CdcPipeline.sessionWindows]] — streaming per-key session windows
  * with native session state, watermark-driven emission, and the masked-
  * key heartbeat discipline (non-image records advance the clock but can
  * never join or stretch a real key's session). */
class StreamSessionSuite extends AnyFunSuite {
  private val s = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("session state operator runs, evicts, and every emitted session " +
      "is image-only (no null-key leakage, extents = image seqs)") {
    val root = new java.io.File("/tmp/graft_stream_sess_state")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(root); root.mkdirs()
    val chunkDir = new java.io.File(root, "chunks")
    CdcPipeline.recordFixtureCached(s, sf, chunkDir.getAbsolutePath,
      ordered = true)
    val q = CdcPipeline.sessionWindows(s, chunkDir.getAbsolutePath,
      new java.io.File(root, "ck").getAbsolutePath,
      new java.io.File(root, "out").getAbsolutePath)
    q.awaitTermination()
    val ops = q.recentProgress.flatMap(_.stateOperators.map(_.operatorName))
    assert(ops.exists(_.toLowerCase.contains("session")),
      s"expected a session-window state operator, got: ${ops.toSet}")
    val removed = q.recentProgress.flatMap(_.stateOperators)
      .map(_.numRowsRemoved).sum
    assert(removed > 0, "no session-state rows were ever evicted")

    val out = s.read.parquet(new java.io.File(root, "out").getAbsolutePath)
      .collect()
    assert(out.nonEmpty)
    // the null-key pool (heartbeats, markers, UPDBEF) never surfaces
    assert(out.forall(!_.isNullAt(0)), "null-key session leaked")
    // session extent comes from image seqs only: start == first image seq,
    // and seq bounds are the image encoding (event_id * 4 + 2 ≡ 2 mod 4)
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(3), "session start != first image seq")
      assert(r.getLong(3) % 4 == 2 && r.getLong(4) % 4 == 2,
        s"session bounds carry a non-image seq: $r")
      assert(r.getLong(2) >= 1 && r.getLong(4) >= r.getLong(3))
    }
  }
}
