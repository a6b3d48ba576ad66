package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exactly-once semantics of the versioned-snapshot MV merge: retry
  * idempotence (the failure latest-wins sinks absorb but additive
  * aggregates cannot), partial-crash replay, and the streaming IVM
  * invariant stream-maintained ≡ recomputed. */
class MvStreamSuite extends AnyFunSuite {

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("mv_stream").toString

  private def units(rows: (Long, Double, Long)*) = {
    val s = TestSpark.spark
    import s.implicits._
    rows.toSeq.toDF("k", "v", "seq")
      .select(col("k"), lit(1L).as("n_rows"),
        col("v").cast("decimal(18,2)").as("sum_dec"),
        col("seq").as("last_seq"))
  }

  private def state(mvDir: String): Map[Long, (Long, BigDecimal, Long)] =
    MvStream.readMv(TestSpark.spark, mvDir).collect()
      .map(r => r.getAs[Long]("k") ->
        ((r.getAs[Long]("n_rows"),
          BigDecimal(r.getAs[java.math.BigDecimal]("sum_dec")),
          r.getAs[Long]("last_seq"))))
      .toMap

  test("batches accumulate; re-applying a batch id is a no-op (retry " +
      "idempotence for an additive merge)") {
    val mv = freshDir()
    MvStream.processBatch(units((1L, 1.5, 10L), (2L, 2.0, 11L)), 0L, mv)
    MvStream.processBatch(units((2L, 3.0, 20L), (3L, 4.0, 21L)), 1L, mv)
    val afterTwo = state(mv)
    assert(afterTwo == Map(
      1L -> ((1L, BigDecimal("1.50"), 10L)),
      2L -> ((2L, BigDecimal("5.00"), 20L)),
      3L -> ((1L, BigDecimal("4.00"), 21L))))
    // foreachBatch retry: same batch id, same data — must not double-count
    MvStream.processBatch(units((2L, 3.0, 20L), (3L, 4.0, 21L)), 1L, mv)
    assert(state(mv) == afterTwo, "replayed batch changed the MV")
  }

  test("partial-crash replay: a bucket already promoted for this batch is " +
      "skipped, a bucket left incomplete is redone from its own prior " +
      "version") {
    val s = TestSpark.spark
    val mv = freshDir()
    // keys 0..15 spread across buckets; batch 0 establishes state
    val b0 = units((0L until 16L).map(k => (k, 1.0, k)): _*)
    MvStream.processBatch(b0, 0L, mv)
    val before = state(mv)
    // simulate a crash mid-batch-1: one bucket fully promoted (complete
    // v=1), another left as an incomplete version dir (no _OK)
    val fs = new org.apache.hadoop.fs.Path(mv)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val buckets = fs.listStatus(new org.apache.hadoop.fs.Path(mv))
      .map(_.getPath.getName).filter(_.startsWith("bucket=")).sorted
    assert(buckets.length > 1, buckets.mkString(","))
    val crashed = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(mv, buckets.last), "v=1")
    fs.mkdirs(crashed) // incomplete: no _OK, garbage content
    // batch 1 adds 2.0 at seq 100+k for every key — the replay
    MvStream.processBatch(
      units((0L until 16L).map(k => (k, 2.0, 100L + k)): _*), 1L, mv)
    val after = state(mv)
    assert(after.keySet == before.keySet)
    before.foreach { case (k, (n, sum, last)) =>
      assert(after(k) == ((n + 1, sum + BigDecimal("2.00"), 100L + k)),
        s"key $k merged wrong after partial-crash replay: ${after(k)}")
    }
  }

  test("stream-maintained MV equals the full recompute over events " +
      "(the streaming IVM invariant)") {
    val s = TestSpark.spark
    val sf = "/root/testdata/sf0.001"
    val got = CdcPipeline.queries("s_mv_delta")(s, sf)
    val want = graft.Tables.events(s, sf)
      .select(col("user_id").as("k"), col("value"), col("event_id"))
      .groupBy("k")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
        max(col("event_id") * 4 + 2).as("last_seq"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "stream-maintained MV diverges from recompute")
    assert(got.count() > 0)
  }
}
