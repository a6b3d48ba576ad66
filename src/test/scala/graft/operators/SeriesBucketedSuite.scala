package graft.operators

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Equality pins for the r13 bucketed trailing-window scaffold
  * ([[SeriesOps.bucketedTrailingFrame]]): the distributed two-pass form
  * (row-number buckets + carried boundary tail) must produce EXACTLY the
  * single-exchange global window's output on every row — including the
  * global ramp-up, bucket boundaries, and arbitrarily sparse/interleaved
  * id layouts — because the production queries (q_rolling_median,
  * q_ewma) now ship the bucketed form. The naive single-exchange twins
  * live HERE, as the executable spec. */
class SeriesBucketedSuite extends AnyFunSuite {

  /** Sparse, interleaved, skewed ids across three types: type a on
    * multiples of 7, type b on multiples of 3 (overlapping id space),
    * type c clustered in two distant runs — the layouts that break
    * id-range bucketing (non-adjacent context) and would hide a
    * boundary bug under a dense sequential id grid. */
  private def syntheticEvents: DataFrame = {
    val s = TestSpark.spark
    import s.implicits._
    val a = (1 to 400).map(i => ("a", 7L * i, (i % 23) + 0.5 * (i % 7)))
    val b = (1 to 500).map(i => ("b", 3L * i, (i % 11) * 1.25))
    val c = (1 to 120).map(i => ("c", i.toLong, i * 0.125)) ++
      (1 to 120).map(i => ("c", 1000000L + i, 40.0 - i * 0.25))
    (a ++ b ++ c).toDF("event_type", "event_id", "value")
  }

  private def naiveMedian(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
      .rowsBetween(-49, 0)
    events
      .select(col("event_type"), col("event_id"), col("value"),
        expr("cast(round(value * 1000000) AS bigint)").as("_vm"))
      .withColumn("med_micro", expr("percentile(_vm, 0.5)").over(w))
      .select(col("event_type"), col("event_id"), col("value"),
        col("med_micro"))
  }

  private def naiveEwma(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
      .rowsBetween(-29, 0)
    events
      .select(col("event_type"), col("event_id"),
        expr("cast(round(value * 1000000) AS bigint)").as("_vm"))
      .withColumn("_l", collect_list(col("_vm")).over(w))
      .withColumn("ewma_micro", expr(
        """aggregate(
          |  zip_with(_l, sequence(0, size(_l) - 1),
          |           (x, i) -> x * shiftleft(cast(1 AS bigint), i)),
          |  cast(0 AS bigint), (a, x) -> a + x)
          |div (shiftleft(cast(1 AS bigint), size(_l)) - 1)""".stripMargin))
      .select(col("event_type"), col("event_id"), col("ewma_micro"))
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.orderBy(col("event_type"), col("event_id"))
      .collect().map(_.mkString("|")).toSeq

  test("rollingMedian bucketed == single-exchange window on sparse " +
      "interleaved ids, across bucket sizes incl. the tail+1 edge") {
    val ev = syntheticEvents
    val want = sortedRows(naiveMedian(ev))
    // 64: many buckets; 50: the minimum legal bucket (carry = 49 of 50
    // rows); 8192: the production default (single bucket here)
    for (b <- Seq(50L, 64L, 8192L)) {
      assert(sortedRows(SeriesOps.rollingMedian(ev, b)) == want, s"b=$b")
    }
  }

  test("ewmaTrailing bucketed == single-exchange window on sparse " +
      "interleaved ids, across bucket sizes") {
    val ev = syntheticEvents
    val want = sortedRows(naiveEwma(ev))
    for (b <- Seq(30L, 64L, 8192L)) {
      assert(sortedRows(SeriesOps.ewmaTrailing(ev, b)) == want, s"b=$b")
    }
  }

  test("bucketed forms match the naive windows on the real events table") {
    val s = TestSpark.spark
    val ev = graft.Tables.events(s, "/root/testdata/sf0.001")
    assert(sortedRows(SeriesOps.rollingMedian(ev, 64L))
      == sortedRows(naiveMedian(ev)))
    assert(sortedRows(SeriesOps.ewmaTrailing(ev, 64L))
      == sortedRows(naiveEwma(ev)))
  }

  test("bucketedTrailingFrame: partitions are bounded — no (type, bkt) " +
      "group exceeds bucketRows + tail rows, and home rows partition " +
      "the input exactly") {
    val ev = syntheticEvents
    val fr = SeriesOps.bucketedTrailingFrame(ev, 49, 64L)
    val sizes = fr.groupBy(col("event_type"), col("_bkt"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("_home"), 1L).otherwise(0L)).as("homes"))
      .collect()
    sizes.foreach { r =>
      assert(r.getLong(2) <= 64L + 49L, r)
      assert(r.getLong(3) <= 64L, r)
    }
    assert(fr.filter(col("_home")).count() == ev.count())
  }

  test("q_rolling_median's percentile window runs over (type, _bkt), " +
      "never a whole type in one task") {
    val p = graft.SparkEntry.queries("q_rolling_median")(
      TestSpark.spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val medWindow = p.linesIterator.filter(_.contains("percentile")).toList
    assert(medWindow.nonEmpty && medWindow.forall(_.contains("_bkt")), p)
  }
}
