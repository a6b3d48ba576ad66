package graft.streaming

import graft.{Tables, TestSpark}
import graft.cdc._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[CdcPipeline.commitJoin]] — the watermarked stream-stream join: parity
  * with the batch recomputation, structural rollback filtering,
  * cross-micro-batch join state, exactly-once replay, and the plan pin
  * that it really runs as Spark's symmetric hash join with watermarked
  * state (not an unbounded buffer).
  */
class StreamJoinSuite extends AnyFunSuite {
  private val s = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def freshRoot(tag: String): java.io.File = {
    val root = new java.io.File(s"/tmp/graft_stream_join_spec/$tag")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(root)
    root.mkdirs()
    root
  }

  test("streamed join == batch recomputation; rolled-back txns never appear") {
    val got = CdcPipeline.queries("s_stream_join")(s, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    // Batch recomputation of the same mapping from events.
    val want = Tables.events(s, sf)
      .select(col("event_id"), col("user_id"),
        (col("event_id") / 20).cast("int").as("txid"))
      .groupBy(col("txid"))
      .agg(collect_list(struct(col("event_id"), col("user_id"))).as("rows"),
        (max(col("event_id") * 4 + 2) + 1).as("commit_seq"))
      .filter(col("txid") % 13 =!= 5)
      .select(col("txid"), col("commit_seq"), explode(col("rows")).as("r"))
      .select((col("r.event_id") * 4 + 2).as("seq"), col("r.user_id").as("k"),
        col("txid"), col("commit_seq"))
      .orderBy(col("seq"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(got.length == want.length)
    assert(got.sameElements(want))
    assert(!got.exists { case (_, _, txid, _) => txid % 13 == 5 })
  }

  test("joins across micro-batches: images and commit in different files") {
    val root = freshRoot("crossbatch")
    val chunkDir = new java.io.File(root, "chunks"); chunkDir.mkdirs()
    val schema = DdlParser.parse(
      CdcPipeline.StreamTabid, CdcPipeline.StreamTabname, CdcPipeline.StreamDdl)
    def tabFrame = CdcCodec.encodeFrame(TabSchema(
      CdcPipeline.StreamTabid, 0, 8 + 8, 2, 1, CdcPipeline.StreamDdl))
    // File 0: txn 1 BEGIN + two images (no terminal), plus rolled-back txn
    // 2 complete. File 1: txn 1's COMMIT — the join half arrives one
    // micro-batch later, so the match must come out of buffered state.
    val f0 = new java.io.ByteArrayOutputStream()
    f0.write(tabFrame)
    f0.write(CdcCodec.encodeFrame(BeginTx(9L, 1, startTime = 10L, userId = 0)))
    f0.write(CdcCodec.encodeRowFrame(CdcRecords.INSERT, schema, 10L, 1, 0,
      IndexedSeq(100L, 1.5, "click")))
    f0.write(CdcCodec.encodeRowFrame(CdcRecords.INSERT, schema, 12L, 1, 0,
      IndexedSeq(101L, 2.5, "view")))
    f0.write(CdcCodec.encodeFrame(BeginTx(13L, 2, startTime = 14L, userId = 0)))
    f0.write(CdcCodec.encodeRowFrame(CdcRecords.INSERT, schema, 14L, 2, 0,
      IndexedSeq(200L, 9.0, "click")))
    f0.write(CdcCodec.encodeFrame(RollbackTx(15L, 2)))
    f0.write(CdcCodec.encodeFrame(TimeoutBeat(15L)))
    val f1 = new java.io.ByteArrayOutputStream()
    f1.write(tabFrame)
    f1.write(CdcCodec.encodeFrame(CommitTx(16L, 1, commitTime = 16L)))
    f1.write(CdcCodec.encodeFrame(TimeoutBeat(10000000L)))
    Seq(f0, f1).zipWithIndex.foreach { case (out, i) =>
      val f = new java.io.File(chunkDir, f"chunk-$i%03d.bin")
      java.nio.file.Files.write(f.toPath, out.toByteArray)
      f.setLastModified(1700000000000L + i * 60000L)
    }
    val outDir = new java.io.File(root, "joined").getAbsolutePath
    CdcPipeline.commitJoin(s, chunkDir.getAbsolutePath,
      new java.io.File(root, "ck").getAbsolutePath, outDir,
      maxFilesPerTrigger = 1).awaitTermination()
    val rows = s.read.parquet(outDir).orderBy(col("seq"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(rows.toSeq == Seq((10L, 100L, 1, 16L), (12L, 101L, 1, 16L)))
  }

  test("replay from the checkpoint is a no-op (exactly-once)") {
    // First run happened in the parity test (same deterministic dirs).
    val before = CdcPipeline.queries("s_stream_join")(s, sf).count()
    val root = new java.io.File(
      s"/tmp/graft_stream_join/${sf.replaceAll("[^A-Za-z0-9.]", "_")}")
    val q = CdcPipeline.commitJoin(s,
      new java.io.File(root, "chunks").getAbsolutePath,
      new java.io.File(root, "checkpoint").getAbsolutePath,
      new java.io.File(root, "joined").getAbsolutePath)
    q.awaitTermination()
    val after = s.read.parquet(
      new java.io.File(root, "joined").getAbsolutePath).count()
    assert(after == before)
  }

  test("runs as a watermarked symmetric hash join (bounded state)") {
    val root = freshRoot("planpin")
    val chunkDir = new java.io.File(root, "chunks")
    CdcPipeline.recordFixtureCached(s, sf, chunkDir.getAbsolutePath,
      ordered = true)
    val q = CdcPipeline.commitJoin(s, chunkDir.getAbsolutePath,
      new java.io.File(root, "ck").getAbsolutePath,
      new java.io.File(root, "joined").getAbsolutePath)
    q.awaitTermination()
    val ops = q.recentProgress.flatMap(_.stateOperators.map(_.operatorName))
    assert(ops.contains("symmetricHashJoin"),
      s"expected a symmetricHashJoin state operator, got: ${ops.toSet}")
    // Watermark eviction is active: rows actually leave the join state as
    // the watermark advances (cleanup lags one micro-batch by design —
    // batch N removes with the watermark computed after batch N-1 — so
    // the final batch still holds the tail; what matters is that state is
    // watermark-bounded at all, not an unbounded buffer).
    val removed = q.recentProgress.flatMap(_.stateOperators)
      .map(_.numRowsRemoved).sum
    assert(removed > 0,
      "watermark advanced but no join-state rows were ever evicted")
  }
}
