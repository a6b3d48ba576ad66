package graft.streaming

import graft.TestSpark
import graft.operators.BloomJoin
import org.scalatest.funsuite.AnyFunSuite

/** The streaming membership index's contract: the stream-maintained
  * bitmap is bit-identical to a batch build over the same keys, replays
  * rewrite instead of double-counting, and the probe is exactly the
  * member set (bloom false positives die in the exact verify). */
class BloomStreamSuite extends AnyFunSuite {

  private def freshRoot(tag: String): String = {
    val f = new java.io.File(s"/tmp/graft_bloom_suite/$tag")
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) x.listFiles().foreach(rm)
      x.delete()
    }
    rm(f); f.mkdirs(); f.getAbsolutePath
  }

  test("stream-folded bitmap is bit-identical to the batch build, and " +
      "a batch replay rewrites instead of double-counting") {
    val s = TestSpark.spark
    import s.implicits._
    val root = freshRoot("fold")
    val all = (0L until 300L).map(_ * 3L)
    // Deliver as three micro-batches.
    all.grouped(100).zipWithIndex.foreach { case (ks, id) =>
      BloomStream.processBatch(ks.toDF("k"), id.toLong, root)
    }
    // Replay batch 1 verbatim (the foreachBatch retry shape): the
    // batch=1 directory is overwritten, so the fold sees it once.
    BloomStream.processBatch(all.slice(100, 200).toDF("k"), 1L, root)
    val streamed = BloomStream.foldedBloom(s, root)
      .head().getSeq[Long](0)
    val batch = BloomJoin.buildBloom(all.toDF("k"), "k")
      .head().getSeq[Long](0)
    assert(streamed == batch)
    // exactly 3 batch partitions on disk — the replay did not add one
    val parts = new java.io.File(s"$root/bloom").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).sorted
    assert(parts.toSeq == Seq("batch=0", "batch=1", "batch=2"), parts.toSeq)
  }

  test("probe returns exactly the member set: misses and false " +
      "positives are gone after the exact verify") {
    val s = TestSpark.spark
    import s.implicits._
    val root = freshRoot("probe")
    val members = (0L until 200L).map(_ * 7L)
    members.grouped(80).zipWithIndex.foreach { case (ks, id) =>
      BloomStream.processBatch(ks.toDF("k"), id.toLong, root)
    }
    // candidates: every member + a disjoint miss range
    val cand = (members ++ (100000L until 100500L)).toDF("k")
    val got = BloomStream.probe(s, root, cand, "k")
      .as[Long].collect().toSet
    assert(got == members.toSet)
  }
}
