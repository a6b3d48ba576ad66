package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the snapshot-diff change-stream derivation and the
  * incremental-MV merge, on a crafted stream that straddles the
  * `SnapshotSeq = 5000` boundary with every transition kind: update,
  * delete (tombstone after the boundary), insert (key born after the
  * boundary, and key whose old state was a tombstone), unchanged value
  * (same and different seq — neither may emit), and absent-in-both. */
class SnapshotDiffSuite extends AnyFunSuite {

  private lazy val dir: String = {
    val s = TestSpark.spark
    import s.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    // purchase = upsert, error = tombstone; clicks are noise the
    // presence filter must ignore.
    val events = Seq(
      (100L, ts(0), 1L, "purchase", 10.0, "{}"),  // u1: 10 -> 20  (update)
      (6000L, ts(1), 1L, "purchase", 20.0, "{}"),
      (200L, ts(2), 2L, "purchase", 5.0, "{}"),   // u2: unchanged (no row)
      (300L, ts(3), 3L, "purchase", 7.0, "{}"),   // u3: tombstoned (delete)
      (7000L, ts(4), 3L, "error", 0.0, "{}"),
      (400L, ts(5), 4L, "error", 0.0, "{}"),      // u4: tombstone -> present
      (8000L, ts(6), 4L, "purchase", 9.0, "{}"),  //     (insert)
      (9000L, ts(7), 5L, "purchase", 3.0, "{}"),  // u5: born late (insert)
      (500L, ts(8), 6L, "purchase", 4.0, "{}"),   // u6: same VALUE re-upserted
      (6500L, ts(9), 6L, "purchase", 4.0, "{}"),  //     at a new seq (no row)
      (600L, ts(10), 7L, "error", 0.0, "{}"),     // u7: absent in both
      (7500L, ts(11), 7L, "error", 0.0, "{}"),
      (700L, ts(12), 8L, "purchase", 1.0, "{}"),  // u8: tombstone then
      (5200L, ts(13), 8L, "error", 0.0, "{}"),    //     re-upsert after T:
      (5600L, ts(14), 8L, "purchase", 2.0, "{}"), //     1 -> 2 (update)
      (800L, ts(15), 1L, "click", 99.0, "{}"))    // noise
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val d = java.nio.file.Files.createTempDirectory("snapdiff_fix").toString
    events.coalesce(1).write.parquet(s"$d/events.parquet")
    d
  }

  test("q_snapshot_diff: emits exactly the state transitions, nothing for " +
      "unchanged or absent-in-both keys") {
    val got = CdcQueries.queries("q_snapshot_diff")(TestSpark.spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1),
          Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(got == Map(
      1L -> (("update", Some(10.0), Some(20.0))),
      3L -> (("delete", Some(7.0), None)),
      4L -> (("insert", None, Some(9.0))),
      5L -> (("insert", None, Some(3.0))),
      8L -> (("update", Some(1.0), Some(2.0)))))
  }

  test("q_snapshot_diff: agrees with an independent two-snapshot " +
      "full-outer-join implementation on the driver data") {
    val s = TestSpark.spark
    val sf = "/root/testdata/sf0.001"
    def snap(maxSeq: Long) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("event_id").desc)
      graft.Tables.events(s, sf)
        .filter(col("event_type").isin("purchase", "error")
          && col("event_id") <= maxSeq)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("seq"), col("value"))
    }
    // sf0.001 event ids top out below 5000, so diff against the midpoint
    // of the actual id range to exercise a non-trivial boundary here.
    val ids = graft.Tables.events(s, sf).agg(max(col("event_id"))).head.getLong(0)
    val t0 = ids / 2
    val o = snap(t0).withColumnRenamed("seq", "old_seq")
      .withColumnRenamed("value", "old_value")
    val n = snap(Long.MaxValue).withColumnRenamed("seq", "new_seq")
      .withColumnRenamed("value", "new_value")
    val expected = o.join(n, Seq("user_id"), "full_outer")
      .withColumn("op",
        when(col("old_seq").isNull && col("new_seq").isNotNull, "insert")
          .when(col("old_seq").isNotNull && col("new_seq").isNull, "delete")
          .when(col("old_value") =!= col("new_value"), "update"))
      .filter(col("op").isNotNull)
      .select("user_id", "op", "old_value", "new_value", "old_seq", "new_seq")
    // Re-run the production shape with the same boundary by replaying its
    // classification over max_by aggregation (mirrors qSnapshotDiff with
    // T = t0 instead of the query's fixed literal).
    val img = struct(col("event_id"), col("event_type"), col("value"))
    val st = graft.Tables.events(s, sf)
      .filter(col("event_type").isin("purchase", "error"))
      .groupBy(col("user_id"))
      .agg(max_by(img, when(col("event_id") <= t0, col("event_id"))).as("o"),
        max_by(img, col("event_id")).as("n"))
    val oldP = col("o").isNotNull && col("o.event_type") === "purchase"
    val newP = col("n.event_type") === "purchase"
    val got = st.select(
        col("user_id"),
        when(!oldP && newP, lit("insert"))
          .when(oldP && !newP, lit("delete"))
          .when(oldP && newP && col("o.value") =!= col("n.value"), "update")
          .as("op"),
        when(oldP, col("o.value")).as("old_value"),
        when(newP, col("n.value")).as("new_value"),
        when(oldP, col("o.event_id")).as("old_seq"),
        when(newP, col("n.event_id")).as("new_seq"))
      .filter(col("op").isNotNull)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      s"max_by diff disagrees with join diff at T=$t0")
    assert(got.count() > 0, "degenerate: no transitions at the midpoint")
  }

  test("mergeAggMv: merge(prefix MV, delta) == full recompute, at every " +
      "split point") {
    val s = TestSpark.spark
    val ev = s.read.parquet(s"$dir/events.parquet")
    val full = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("sum_dec"),
        max(col("event_id")).as("last_seq"))
    for (t <- Seq(0L, 450L, 5000L, 6200L, 10000L)) {
      val base = ev.filter(col("event_id") <= t).groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).as("sum_dec"),
          max(col("event_id")).as("last_seq"))
      val delta = ev.filter(col("event_id") > t)
        .select(col("user_id"), lit(1L).as("n_events"),
          col("value").cast("decimal(18,2)").as("sum_dec"),
          col("event_id").as("last_seq"))
      val merged = CdcQueries.mergeAggMv(base, delta, Seq("user_id"),
        sumCols = Seq("n_events", "sum_dec"), maxCols = Seq("last_seq"))
        .select(col("user_id"), col("n_events"),
          col("sum_dec").cast("decimal(38,2)").as("sum_dec"), col("last_seq"))
      val want = full.select(col("user_id"), col("n_events"),
        col("sum_dec").cast("decimal(38,2)").as("sum_dec"), col("last_seq"))
      assert(merged.exceptAll(want).isEmpty && want.exceptAll(merged).isEmpty,
        s"IVM invariant broken at split T=$t")
    }
  }
}
