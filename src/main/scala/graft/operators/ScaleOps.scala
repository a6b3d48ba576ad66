package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-path operators: the techniques that keep the 100 TB plan alive
  * when a key is hot or an exact answer is unaffordable.
  *
  *  - [[qSkewSaltedJoin]] — salted join, the standard mitigation for a
  *    shuffle join whose key distribution is pathological: `events` joins
  *    its per-type statistics on `event_type`, a 5-value key where every
  *    value is hot (~20% of the table each). An unsalted shuffle join puts
  *    each hot key on ONE reducer; salting fans the build side out to
  *    `NumSalts` copies and routes probe rows by a deterministic salt, so
  *    every (key, salt) bucket is 1/NumSalts of a hot key. Semantically
  *    identical to the plain join — the oracle is the UNSALTED join, so the
  *    rewrite is hash-checked to change nothing but the distribution. (AQE
  *    skew-join handles moderate skew at runtime by splitting oversized
  *    partitions; explicit salting is the deterministic form that also
  *    covers the build side and stateful/streaming joins, where AQE cannot
  *    re-plan.)
  *
  *  - [[qApproxDistinct]] — HyperLogLog++ distinct-count sketch
  *    (`approx_count_distinct`), the only viable distinct count at 100 TB
  *    for high-cardinality keys: fixed-size sketch, one pass, map-side
  *    merge, no (key, value)-sized shuffle like exact countDistinct's
  *    two-phase expand. Cross-engine, a sketch can only be checked against
  *    its ERROR CONTRACT — the query therefore emits the exact count and a
  *    relative-error-within-bound flag alongside the estimate's error, and
  *    the oracle recomputes the exact count and asserts the flag: if the
  *    sketch ever drifts past its configured rsd, the hash breaks.
  *
  *  - [[qApproxQuantiles]] — Greenwald-Khanna quantile sketch
  *    (`approx_percentile` with accuracy B): rank error ≤ n/B in one pass
  *    with mergeable per-partition state, vs the exact percentile's
  *    per-group full sort. Checked the same way: exact quantiles (which
  *    DuckDB reproduces, same interpolation as q_percentiles) plus
  *    in-rank-bounds flags for the sketch values.
  */
object ScaleOps {

  private[graft] val NumSalts = 8

  private def qSkewSaltedJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("event_type"), col("value"))
    val dim = ev.groupBy(col("event_type")).agg(
      count(lit(1)).as("n_type"),
      min(col("value")).as("min_value"),
      max(col("value")).as("max_value"))
    // Build side: replicate each dim row across all salts; probe side:
    // deterministic salt from the row id. hint("shuffle_hash") pins the
    // shuffled-hash strategy the salt exists to fix (AQE would otherwise
    // broadcast this tiny dim and the demo would measure nothing).
    val salts = (0 until NumSalts).map(lit(_))
    val salted = dim.withColumn("salt", explode(array(salts: _*)))
      .hint("shuffle_hash")
    val probe = ev.withColumn("salt",
      pmod(col("event_id"), lit(NumSalts)).cast("int"))
    probe.join(salted, Seq("event_type", "salt"))
      .select(col("event_id"), col("event_type"), col("n_type"),
        col("min_value"), col("max_value"))
      .orderBy(col("event_id"))
  }

  /** rsd for approx_count_distinct; the contract flag allows 3×rsd —
    * ~3 standard deviations, so a correct sketch passes with near
    * certainty and a broken one (wrong hashing, wrong merge) fails. */
  private[graft] val Rsd = 0.02

  private def qApproxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), Rsd).as("approx_users"))
      .select(col("event_type"), col("n_events"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) <=
          col("exact_users") * (3 * Rsd)).as("sketch_ok"))
      .orderBy(col("event_type"))

  /** GK-sketch accuracy: rank error ≤ n/Accuracy per group. */
  private[graft] val Accuracy = 10000

  private def qApproxQuantiles(s: SparkSession, d: String): DataFrame = {
    val ps = Seq(0.5, 0.9, 0.99)
    val exact = ps.zipWithIndex.map { case (p, i) =>
      expr(s"round(percentile(value, $p), 6)").as(s"exact_p$i")
    }
    val approx = ps.zipWithIndex.map { case (p, i) =>
      expr(s"approx_percentile(value, $p, $Accuracy)").as(s"approx_p$i")
    }
    // Rank-space bound: the sketch value must lie between the exact
    // quantiles at p ± eps (eps = 2/Accuracy, twice the guarantee for
    // boundary slack). All bound quantiles ride in the SAME aggregate pass
    // as the sketch — one scan, one shuffle.
    val eps = 2.0 / Accuracy
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        (exact ++ approx ++ Seq(
          expr(s"percentile(value, ${math.max(0.5 - eps, 0.0)})").as("lo0"),
          expr(s"percentile(value, ${math.min(0.5 + eps, 1.0)})").as("hi0"),
          expr(s"percentile(value, ${math.max(0.9 - eps, 0.0)})").as("lo1"),
          expr(s"percentile(value, ${math.min(0.9 + eps, 1.0)})").as("hi1"),
          expr(s"percentile(value, ${math.max(0.99 - eps, 0.0)})").as("lo2"),
          expr(s"percentile(value, ${math.min(0.99 + eps, 1.0)})").as("hi2"))): _*)
      .select(col("event_type"), col("n"),
        col("exact_p0"), col("exact_p1"), col("exact_p2"),
        (col("approx_p0") >= col("lo0") && col("approx_p0") <= col("hi0")).as("p50_in_bounds"),
        (col("approx_p1") >= col("lo1") && col("approx_p1") <= col("hi1")).as("p90_in_bounds"),
        (col("approx_p2") >= col("lo2") && col("approx_p2") <= col("hi2")).as("p99_in_bounds"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_skew_salted_join" -> qSkewSaltedJoin _,
    "q_approx_distinct" -> qApproxDistinct _,
    "q_approx_quantiles" -> qApproxQuantiles _
  )

  val oracle: Map[String, String] = Map(
    "q_skew_salted_join" ->
      """WITH dim AS (
        |  SELECT event_type, count(*) AS n_type,
        |         min(value) AS min_value, max(value) AS max_value
        |  FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type, d.n_type, d.min_value, d.max_value
        |FROM events e JOIN dim d ON e.event_type = d.event_type
        |ORDER BY e.event_id""".stripMargin,
    // Sketch contract oracles: DuckDB cannot evaluate Spark's HLL++/GK
    // sketches, so it verifies everything exact (counts, quantiles) and
    // asserts the in-bounds flags are TRUE — the sketch's error contract
    // becomes part of the hash check.
    "q_approx_distinct" ->
      """SELECT event_type, count(*) AS n_events,
        |       count(DISTINCT user_id) AS exact_users,
        |       TRUE AS sketch_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_approx_quantiles" ->
      """SELECT event_type, count(*) AS n,
        |       round(quantile_cont(value, 0.5), 6) AS exact_p0,
        |       round(quantile_cont(value, 0.9), 6) AS exact_p1,
        |       round(quantile_cont(value, 0.99), 6) AS exact_p2,
        |       TRUE AS p50_in_bounds, TRUE AS p90_in_bounds,
        |       TRUE AS p99_in_bounds
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
