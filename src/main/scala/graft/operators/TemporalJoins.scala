package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins, composed scale-safely
  * (builder-brief "custom operators" bullet: compose existing ops when the
  * semantics allow — both of these do, so no custom SparkPlan is needed).
  *
  * These generalize the reference's core temporal semantic — "the latest
  * state at or before a point in the totally-ordered log" (the savepoint
  * lookup `select ... where seq <= ?`-shape of ec:2104-2108 and the
  * latest-image materialization) — from one stream to two:
  *
  *  - [[AsOfJoin.asOf]]: for each left row, the single latest right row
  *    with `rightTs <= leftTs` in the same key group. The naive plan is a
  *    range join (candidate explosion, O(n·m) within key) or a per-left
  *    aggregation over all earlier rights; this composition is one UNION +
  *    one window over the key — a single shuffle, no pair blow-up, the
  *    same cost shape as `q_latest_per_key`.
  *  - [[qRangeJoin]]: band join (`leftTs ∈ [rightTs - w, rightTs]`) via
  *    bucket-and-verify: quantize time into width-`w` buckets, equi-join on
  *    (key, bucket) with the probe side exploded to its two candidate
  *    buckets, then verify the exact band predicate. Candidates per probe
  *    are bounded by the band's bucket occupancy — never all-pairs — and
  *    the join is a plain shuffled equi-join AQE can size.
  *
  * At 100 TB both plans shuffle once on (key[, bucket]) and stream through
  * window/codegen stages; neither materializes a cross product.
  */
object AsOfJoin {

  /** For each `left` row, attach the payload of the latest `right` row with
    * `right(rightTs) <= left(leftTs)` in the same `key` group (left-outer:
    * unmatched left rows keep null payload).
    *
    * Both inputs must not share payload column names with `left`; ties on
    * the timestamp prefer the right side (`>=` as-of semantics, matching
    * DuckDB's ASOF JOIN). If several right rows share (key, ts), dedupe
    * first — the winner is otherwise unspecified.
    *
    * Implementation: tag and union both sides, then one window over the
    * key ordered by (ts, side): `last_value(payload) ignore nulls` carries
    * the most recent right payload forward onto every left row. One
    * shuffle on `key`; no range-join candidate explosion. */
  def asOf(left: DataFrame, right: DataFrame, key: Seq[String],
           leftTs: String, rightTs: String,
           rightPayload: Seq[String]): DataFrame = {
    val keyCols: Seq[Column] = key.map(col)
    val leftCols = left.columns.toSeq
    val payloadStruct = struct(rightPayload.map(col): _*)
    // side 0 (right) sorts before side 1 (left) at equal ts → `>=` ties.
    val r = right.select(
      keyCols ++ Seq(col(rightTs).as("_asof_ts"), lit(0).as("_asof_side"),
        payloadStruct.as("_asof_payload")) ++
        leftCols.filterNot(key.contains).map(c => lit(null).as(c)): _*)
    val l = left.select(
      keyCols ++ Seq(col(leftTs).as("_asof_ts"), lit(1).as("_asof_side"),
        lit(null).cast(r.schema("_asof_payload").dataType).as("_asof_payload")) ++
        leftCols.filterNot(key.contains).map(col): _*)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("_asof_ts"), col("_asof_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("_asof_match", last(col("_asof_payload"), ignoreNulls = true).over(w))
      .filter(col("_asof_side") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(p => col(s"_asof_match.$p").as(p)): _*)
  }
}

/** Driver-checked queries for the temporal joins (oracles: DuckDB's native
  * `ASOF LEFT JOIN` for the as-of, a plain inequality join for the band —
  * so the scale-safe compositions are hash-checked against the textbook
  * formulations). */
object TemporalJoins {

  /** Attribution as-of join: for every purchase, the latest click by the
    * same user at or before the purchase time. */
  private def qAsofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        col("value"))
    // Right side deduped per (user, ts): as-of picks "the" latest row, so
    // equal-timestamp clicks must have one deterministic winner.
    val clicks = ev.filter(col("event_type") === "click")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"), col("ts")).orderBy(col("event_id").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"),
        col("ts").as("click_ts"), col("value").as("click_value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    AsOfJoin.asOf(purchases, clicks, Seq("user_id"),
        leftTs = "purchase_ts", rightTs = "ts",
        rightPayload = Seq("click_id", "click_ts", "click_value"))
      .withColumn("gap_us",
        unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
      .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
        col("purchase_value"), col("click_id"), col("click_ts"),
        col("click_value"), col("gap_us"))
      .orderBy(col("purchase_id"))
  }

  private val BandMinutes = 120
  private val BucketUs: Long = BandMinutes.toLong * 60 * 1000000

  /** Band join via bucket-and-verify: view→purchase pairs by the same user
    * with the view inside the 2-hour window before the purchase. */
  private def qRangeJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    // `div`, not `/`: long / long is double division in Spark, and a
    // 1e15-scale µs value divided as double can land on the wrong side of
    // a bucket boundary.
    val bucket = expr(s"unix_micros(ts) div ${BucketUs}L")
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"), bucket.as("bucket"))
    // Probe explodes to its two candidate buckets (band width == bucket
    // width ⇒ the matching views all live in bucket(p) or bucket(p)-1).
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"),
        explode(array(bucket, bucket - 1)).as("bucket"))
    purchases.join(views, Seq("user_id", "bucket"))
      .filter(col("view_ts") <= col("purchase_ts") &&
        col("view_ts") >= col("purchase_ts") - expr(s"INTERVAL $BandMinutes MINUTES"))
      .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
        col("view_id"), col("view_ts"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("view_ts"))).as("gap_us"))
      .orderBy(col("purchase_id"), col("view_id"))
  }

  /** Interval-OVERLAP join (r11): both sides are intervals — the third
    * temporal-join shape beside as-of (point→latest point) and band
    * (point→window). Here: each customer's order fulfillment windows
    * [orderdate, orderdate + deterministic duration] that overlap each
    * other — "which of this customer's orders were open at the same
    * time", the concurrency read behind credit-exposure and
    * fulfillment-contention analyses. Durations are manufactured in-plan
    * (`o_orderkey % 30` days — the q_heavy_hitters deterministic-data
    * pattern) since the demo schema carries one date.
    *
    * Scale shape: overlap is a theta predicate, but the CUSTOMER KEY
    * bounds the group (orders per customer), so the pair space composes
    * as a plain shuffled EQUI-join on the key with the overlap verified
    * in-group — candidates per key are group², never table². The
    * (a < b) order-key tie keeps each unordered pair once. When no key
    * bounds the group, the TIME AXIS itself must be bucketed — exactly
    * [[qRangeJoin]]'s bucket-and-verify applied to intervals: explode
    * each interval to the width-w buckets it touches (w ≥ max interval
    * length keeps the explode ≤ 2) and dedup pairs that met in both.
    *
    * Overlap length is exact date arithmetic: `least(ends) −
    * greatest(starts)` in days, inclusive. */
  /** The reusable key-bounded form behind [[qIntervalJoin]] and
    * [[graft.api.Graft.intervalOverlapJoin]]: `rows` needs one interval
    * per row as (key, id, start, end) DATE columns; returns each
    * overlapping unordered pair within a key once, with the inclusive
    * overlap length in days. */
  private[graft] def intervalOverlapJoin(rows: DataFrame, keyCol: String,
      idCol: String, startCol: String, endCol: String): DataFrame = {
    val o = rows.select(col(keyCol).as("_k"), col(idCol).as("_id"),
      col(startCol).as("_s"), col(endCol).as("_e"))
    val a = o.select(col("_k"), col("_id").as("id_a"),
      col("_s").as("s_a"), col("_e").as("e_a"))
    val b = o.select(col("_k"), col("_id").as("id_b"),
      col("_s").as("s_b"), col("_e").as("e_b"))
    a.join(b, Seq("_k"))
      .filter(col("id_a") < col("id_b") &&
        col("s_a") <= col("e_b") && col("s_b") <= col("e_a"))
      .select(col("_k").as(keyCol), col("id_a"), col("id_b"),
        (datediff(least(col("e_a"), col("e_b")),
          greatest(col("s_a"), col("s_b"))) + 1).cast("bigint")
          .as("overlap_days"))
  }

  private def qIntervalJoin(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("_sd"),
        expr("date_add(to_date(o_orderdate), cast(o_orderkey % 30 AS int))")
          .as("_ed"))
    intervalOverlapJoin(o, "o_custkey", "o_orderkey", "_sd", "_ed")
      .withColumnRenamed("id_a", "order_a")
      .withColumnRenamed("id_b", "order_b")
      .orderBy(col("o_custkey"), col("order_a"), col("order_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> qAsofJoin _,
    "q_range_join" -> qRangeJoin _,
    "q_interval_join" -> qIntervalJoin _
  )

  val oracle: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, cast(ts AS TIMESTAMP) AS ts, event_type, value
        |  FROM events),
        |c AS (
        |  SELECT user_id, ts, click_id, click_value FROM (
        |    SELECT user_id, ts, event_id AS click_id, value AS click_value,
        |           row_number() OVER (PARTITION BY user_id, ts
        |                              ORDER BY event_id DESC) AS rn
        |    FROM ev WHERE event_type = 'click') t WHERE rn = 1),
        |p AS (
        |  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
        |         value AS purchase_value
        |  FROM ev WHERE event_type = 'purchase')
        |SELECT p.user_id, purchase_id, purchase_ts, purchase_value,
        |       c.click_id, c.ts AS click_ts, c.click_value,
        |       epoch_us(purchase_ts) - epoch_us(c.ts) AS gap_us
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.purchase_ts >= c.ts
        |ORDER BY purchase_id""".stripMargin,
    "q_interval_join" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate::DATE AS s,
        |         o_orderdate::DATE + cast(o_orderkey % 30 AS integer) AS e
        |  FROM orders)
        |SELECT a.o_custkey, a.o_orderkey AS order_a, b.o_orderkey AS order_b,
        |       cast(date_diff('day', greatest(a.s, b.s),
        |                      least(a.e, b.e)) + 1 AS bigint) AS overlap_days
        |FROM o a JOIN o b
        |  ON a.o_custkey = b.o_custkey
        | AND a.o_orderkey < b.o_orderkey
        | AND a.s <= b.e AND b.s <= a.e
        |ORDER BY a.o_custkey, order_a, order_b""".stripMargin,
    "q_range_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, cast(ts AS TIMESTAMP) AS ts, event_type
        |  FROM events)
        |SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
        |       v.event_id AS view_id, v.ts AS view_ts,
        |       epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
        |FROM ev p JOIN ev v
        |  ON p.user_id = v.user_id
        | AND p.event_type = 'purchase' AND v.event_type = 'view'
        | AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 120 MINUTE
        |ORDER BY purchase_id, view_id""".stripMargin
  )
}
