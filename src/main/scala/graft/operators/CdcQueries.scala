package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch analogs of the reference's CDC semantics (SURVEY.md §2.b).
  *
  * The `events` table plays the change stream: `event_id` ≈ LSN
  * (`seq_number`, ld8 at ext/_informixcdcmodule.ec:1233), `user_id` ≈
  * transaction id / row key, `event_type` ≈ record type, `ts` ≈ commit time.
  *
  * Scale notes (100 TB design): every aggregate here is a hash aggregate
  * with map-side partial aggregation (Spark plans partial_ + final), so the
  * shuffle carries one row per (key) per map partition, not the raw stream.
  * Window queries shuffle once on the partition key and sort within
  * partitions — the minimum work the semantics allow. Anti joins against
  * small key sets broadcast.
  */
object CdcQueries {

  /** Restart LSN: `select nvl(min(seq_number),0) from informixcdc_opntxns
    * where id = ?` (ext/_informixcdcmodule.ec:590-591), generalized to
    * per-key min over "open" events. */
  private def qOpenTxnMin(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("event_type") === "view")
      .groupBy(col("user_id"))
      .agg(coalesce(min(col("event_id")), lit(0L)).as("restart_seq"))
      .orderBy(col("user_id"))

  /** Last committed LSN: `select seq_number from informixcdc_lsttxn where
    * id = ?` with the monotonic max guard (ec:630-631, 747). */
  private def qLastCommitted(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(max(col("event_id")).as("last_seq"))
      .orderBy(col("user_id"))

  /** Per-transaction assembly: count/min/max/span per txid, the shape of the
    * BEGIN..COMMIT bookkeeping (ec:2259-2299). */
  private def qTxnStats(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_records"),
        min(col("event_id")).as("first_seq"),
        max(col("event_id")).as("last_seq"),
        (max(col("event_id")) - min(col("event_id"))).as("seq_span"))
      .orderBy(col("user_id"))

  /** CDC materialization: latest row image per key by LSN — the semantic
    * heart of applying a change stream (SURVEY.md §7.2). One shuffle on the
    * key, in-partition sort, rank prune; at scale AQE handles skewed keys. */
  private def qLatestPerKey(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").desc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .orderBy(col("user_id"))
  }

  /** AS-OF-LSN time travel (r11): the table's state at three historical
    * log positions (25/50/75% of the head LSN, derived in-plan) in one
    * read — "what did this row look like before the incident?" is the
    * FIRST question a CDC consumer asks of its history; the reference's
    * restart machinery reads state as of a savepoint seq the same way
    * (ec:2172-2194 resolves a position, then state is everything at or
    * below it).
    *
    * Shape: the 3-row snapshot frame broadcasts onto the scan with a
    * `seq ≤ snap` band (BroadcastNestedLoopJoin over 3 rows — bounded),
    * then ONE (snap, key) window picks each key's latest image per
    * snapshot. This is the REPLAY read — cost |log| × |snapshots|, the
    * honest price of reading history from a raw log; a consumer that
    * asks often should maintain checkpoints instead (`q_snapshot_diff` /
    * `s_mv_delta` are that maintained form, and `q_scd2` materializes
    * EVERY version so any as-of read becomes an interval probe). */
  private[graft] def asofSnapshots(events: DataFrame,
      snaps: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("snap_seq"), col("user_id"))
      .orderBy(col("event_id").desc)
    events
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .join(broadcast(snaps), col("event_id") <= col("snap_seq"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("snap_seq"), col("user_id"),
        col("event_id").as("last_seq"), col("event_type"), col("value"))
  }

  private def qAsofSnapshot(s: SparkSession, d: String): DataFrame = {
    val snaps = Tables.events(s, d)
      .agg(max(col("event_id")).as("_m"))
      .selectExpr(
        "explode(array(_m div 4, _m div 2, (_m * 3) div 4)) AS snap_seq")
    asofSnapshots(Tables.events(s, d), snaps)
      .orderBy(col("snap_seq"), col("user_id"))
  }

  /** Pair update before/after images (records 42/43, ec:1848-1856): each
    * change sees the previous image's value via lag over (key, seq). */
  private def qUpdbefUpdaftPair(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.events(s, d)
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("prev_seq", lag(col("event_id"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("value"),
        col("prev_seq"), col("prev_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Drop rows of rolled-back transactions (CDC_REC_RBTX, ec:1566-1615):
    * left-anti join of the change stream against rolled-back txids. The
    * rolled-back key set grows with key cardinality (unbounded), so no
    * broadcast hint — AQE broadcasts when the distinct set fits and falls
    * back to a shuffled anti join when it doesn't. */
  private def qRollbackFilter(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val rolledBack = ev.filter(col("event_type") === "error")
      .select(col("user_id")).distinct()
    ev.join(rolledBack, Seq("user_id"), "left_anti")
      .select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy(col("event_id"))
  }

  /** Apply DELETE records to a base snapshot (CDC_REC_DELETE, ec:1843-1846):
    * left-anti join base ⋈ delete keys. */
  private def qDeleteApply(s: SparkSession, d: String): DataFrame = {
    val base = Tables.customer(s, d)
    val deletes = Tables.orders(s, d)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("c_custkey")).distinct()
    base.join(deletes, Seq("c_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  /** Apply INSERT/UPDAFT upserts to a snapshot — MERGE semantics
    * (CDC_REC_INSERT/UPDAFT, ec:1838-1856): latest change per key wins,
    * unmatched base rows carry through. Full-outer join + coalesce. */
  private def qUpsertMerge(s: SparkSession, d: String): DataFrame = {
    val base = Tables.customer(s, d)
      .select(col("c_custkey").as("key"), col("c_acctbal").as("base_val"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey").desc)
    val updates = Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey").as("key"), col("o_totalprice").as("upd_val"))
    base.join(updates, Seq("key"), "full_outer")
      .select(col("key"),
        coalesce(col("upd_val"), col("base_val")).as("merged_val"))
      .orderBy(col("key"))
  }

  /** Truncate marker (CDC_REC_TRUNCATE, ec:1657-1720) zeroes a table before
    * later changes: keep only events after each key's last truncate-like
    * marker (here: the key's last 'signup'). The per-key truncate-LSN map
    * is one row per key — unbounded — so no broadcast hint; AQE chooses. */
  private def qTruncateApply(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val truncAt = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(max(col("event_id")).as("trunc_seq"))
    ev.join(truncAt, Seq("user_id"), "left")
      .filter(col("trunc_seq").isNull || col("event_id") > col("trunc_seq"))
      .select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy(col("event_id"))
  }

  /** SCD Type-2 dimension history from the change stream (r9): the OTHER
    * canonical way to apply CDC besides latest-wins ([[qLatestPerKey]]) and
    * MERGE ([[qUpsertMerge]]) — keep every version. Consecutive duplicate
    * values collapse (a re-delivered identical image opens no new version,
    * the same idempotence the reference's monotonic guard enforces at
    * ec:663-771), and each surviving version is valid from its own seq
    * until the next version's seq, open-ended (`valid_to_seq` NULL,
    * `is_current` 1) for the key's last version. A key's FIRST image
    * always opens version 1, even a NULL image (a delete encoded as a
    * NULL value must not leave the prior state looking current) — the
    * null-safe compare alone can't tell "first row" from "previous
    * value was NULL", so the first-row keep is an explicit row_number
    * guard on the same window.
    *
    * Scale: ONE shuffle on the key; the change-compression lag and the
    * version numbering/lead reuse the same (key, seq) sort order, so
    * Spark plans a single exchange with window passes stacked on it —
    * never a self-join of the history against itself. */
  private[graft] def scd2History(changes: DataFrame, keyCol: String,
      seqCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol))
    val versions = changes
      .select(col(keyCol), col(seqCol), col(valueCol))
      .withColumn("_prev", lag(col(valueCol), 1).over(w))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 || !(col(valueCol) <=> col("_prev")))
    versions
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to_seq", lead(col(seqCol), 1).over(w))
      .select(col(keyCol), col("version"),
        col(seqCol).as("valid_from_seq"), col("valid_to_seq"),
        col(valueCol),
        col("valid_to_seq").isNull.cast("int").as("is_current"))
  }

  private def qScd2(s: SparkSession, d: String): DataFrame =
    scd2History(Tables.events(s, d), "user_id", "event_id", "value")
      .orderBy(col("user_id"), col("version"))

  /** Micro-batch/time bucketing of commits (TIMEOUT heartbeats,
    * ec:1403-1428): tumbling 1-hour windows. Sums go through decimal so the
    * result is order-independent (exact) — required for oracle parity and
    * good practice for money-like measures at any scale. */
  private def qTumblingWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("hour"), col("n_events"), col("sum_value"))
      .orderBy(col("hour"))

  /** Hopping (sliding) windows: 1-hour windows advancing every 30 minutes,
    * per event type — the batch analog of streaming sliding-window
    * aggregation. Each event lands in exactly size/slide = 2 overlapping
    * windows; Spark's window() expands each row to its containing windows
    * BEFORE the hash aggregate, so the shuffle carries (window, type)
    * partials at 2× row count — never a window × event join. Both engines
    * bucket on epoch-aligned 30-minute boundaries (DuckDB's time_bucket
    * origin 2000-01-03 is itself 30-minute-aligned to the epoch, so the
    * grids coincide). */
  private def qHoppingWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy(col("w_start"), col("event_type"))

  /** Transaction grouping by activity gap: 30-minute session windows per
    * key. Uses Spark's session_window; the oracle reproduces the semantics
    * with gaps-and-islands SQL (SURVEY.md §7.4.6). */
  private def qSessionWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("user_id"),
        date_trunc("second", col("w.start")).as("session_start"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** Snapshot boundary for [[qSnapshotDiff]] / [[qMvDelta]]: the "old"
    * state is the stream applied through this LSN. A literal, like
    * q_filter_seq's threshold — at larger scale factors it simply means
    * an older base snapshot / bigger delta, which is the interesting
    * case anyway. */
  private val SnapshotSeq = 5000L

  /** Derive a change stream by DIFFING two snapshot states — the inverse
    * of applying one ([[qUpsertMerge]]/[[qDeleteApply]]), and how CDC is
    * bootstrapped when a source offers only periodic snapshots (the
    * reference assumes a live log, ec:2228-2393; snapshot-diff is what
    * replaces it when there isn't one). State at time T = per key, the
    * latest 'purchase' (upsert) or 'error' (tombstone) at seq <= T;
    * present iff that record is an upsert. Emits `insert` (absent→present),
    * `delete` (present→absent), `update` (present in both, value changed);
    * identical state emits nothing, so re-running the diff against an
    * unchanged source is a no-op — the idempotence CDC replay needs.
    *
    * Scale: BOTH snapshots come out of ONE scan and ONE shuffle — a
    * conditional `max_by` per bound ranks the old snapshot only over rows
    * at seq <= T (a NULL ordering key never wins, so keys born later have
    * NULL old-state), the new over all rows. No self-join of the log, no
    * second scan, and the shuffle carries one partial per (key, bound)
    * per map partition — at 100 TB the diff costs exactly one pass over
    * the log plus a key-cardinality exchange. */
  private def qSnapshotDiff(s: SparkSession, d: String): DataFrame = {
    val img = struct(col("event_id"), col("event_type"), col("value"))
    val st = Tables.events(s, d)
      .filter(col("event_type").isin("purchase", "error"))
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .groupBy(col("user_id"))
      .agg(
        max_by(img, when(col("event_id") <= SnapshotSeq, col("event_id")))
          .as("o"),
        max_by(img, col("event_id")).as("n"))
    val oldP = col("o").isNotNull && col("o.event_type") === "purchase"
    val newP = col("n.event_type") === "purchase"
    st.select(
        col("user_id"),
        when(!oldP && newP, lit("insert"))
          .when(oldP && !newP, lit("delete"))
          .when(oldP && newP && col("o.value") =!= col("n.value"),
            lit("update")).as("op"),
        when(oldP, col("o.value")).as("old_value"),
        when(newP, col("n.value")).as("new_value"),
        when(oldP, col("o.event_id")).as("old_seq"),
        when(newP, col("n.event_id")).as("new_seq"))
      .filter(col("op").isNotNull)
      .orderBy(col("user_id"))
  }

  /** Merge a materialized aggregate with same-shaped delta contributions:
    * `unionByName` + one hash aggregate re-combining count-like columns
    * with `sum` and high-water columns with `max`. The base MV rows and
    * the delta's unit rows must share the schema (each delta row carries
    * its unit contribution: 1 for counts, the value for sums/maxes). */
  private[graft] def mergeAggMv(baseMv: DataFrame, deltaRows: DataFrame,
      keyCols: Seq[String], sumCols: Seq[String],
      maxCols: Seq[String]): DataFrame = {
    val aggs = sumCols.map(c => sum(col(c)).as(c)) ++
      maxCols.map(c => max(col(c)).as(c))
    baseMv.unionByName(deltaRows)
      .groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Incremental materialized-view maintenance: refresh a per-key
    * count/sum/high-water aggregate from a change stream WITHOUT
    * recomputing history — the pattern every 100 TB nightly pipeline
    * lives on (recompute scans the full log forever; IVM scans only the
    * delta). The base MV (state through [[SnapshotSeq]]) is a build-once
    * parquet fixture ([[MvBase]] — at scale, yesterday's refresh output);
    * this query unions those pre-aggregated rows with the delta's raw
    * unit contributions and re-aggregates. count and sum merge because
    * they're commutative monoids; avg is DERIVED from them after the
    * merge (averages of averages would be wrong).
    *
    * The oracle is the full recompute over the whole log — the IVM
    * invariant merge(base, delta) ≡ recompute(all), checked exactly
    * (sums in decimal, so no float-order drift can hide in the merge).
    *
    * Scale: ONE exchange total. The delta scan's pushed filter
    * (event_id > T) prunes the log read; map-side partial aggregation
    * folds delta rows before the shuffle, so the exchange carries one
    * row per key per map partition no matter how big the delta is, and
    * the base MV (key cardinality, not log cardinality) streams through
    * the same aggregate unshuffled-in-spirit (its rows are already one
    * per key). */
  private def qMvDelta(s: SparkSession, d: String): DataFrame = {
    val base = s.read.parquet(MvBase.ensure(s, d))
    val delta = Tables.events(s, d)
      .filter(col("event_id") > SnapshotSeq)
      .select(col("user_id"),
        lit(1L).as("n_events"),
        col("value").cast("decimal(18,2)").as("sum_dec"),
        col("event_id").as("last_seq"))
    mergeAggMv(base, delta, Seq("user_id"),
        sumCols = Seq("n_events", "sum_dec"), maxCols = Seq("last_seq"))
      .select(col("user_id"), col("n_events"),
        col("sum_dec").cast("double").as("sum_value"),
        (col("sum_dec").cast("double") / col("n_events")).as("avg_value"),
        col("last_seq"))
      .orderBy(col("user_id"))
  }

  /** Build-once base MV for [[qMvDelta]]: the per-key aggregate of the
    * stream through [[SnapshotSeq]], persisted as parquet — standing in
    * for the previous refresh's output. Same serial-harness discipline as
    * [[ScaleOps.BucketedTables]]; the first call in a JVM pays the build
    * (covered by the bench warm-up pass). Sum partials stay DECIMAL in
    * the fixture so the later merge is exact regardless of row order. */
  private[graft] object MvBase {
    def ensure(s: SparkSession, d: String): String = synchronized {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = s"${sys.props("java.io.tmpdir")}/graft_mv_base/$tag"
      if (!new java.io.File(s"$path/_SUCCESS").exists()) {
        Tables.events(s, d)
          .filter(col("event_id") <= SnapshotSeq)
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(18,2)")).as("sum_dec"),
            max(col("event_id")).as("last_seq"))
          .write.mode("overwrite").parquet(path)
      }
      path
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_open_txn_min" -> qOpenTxnMin _,
    "q_last_committed" -> qLastCommitted _,
    "q_txn_stats" -> qTxnStats _,
    "q_latest_per_key" -> qLatestPerKey _,
    "q_asof_snapshot" -> qAsofSnapshot _,
    "q_updbef_updaft_pair" -> qUpdbefUpdaftPair _,
    "q_rollback_filter" -> qRollbackFilter _,
    "q_delete_apply" -> qDeleteApply _,
    "q_upsert_merge" -> qUpsertMerge _,
    "q_truncate_apply" -> qTruncateApply _,
    "q_scd2" -> qScd2 _,
    "q_tumbling_window" -> qTumblingWindow _,
    "q_hopping_window" -> qHoppingWindow _,
    "q_session_window" -> qSessionWindow _,
    "q_snapshot_diff" -> qSnapshotDiff _,
    "q_mv_delta" -> qMvDelta _
  )

  val oracle: Map[String, String] = Map(
    "q_open_txn_min" ->
      """SELECT user_id, coalesce(min(event_id), 0) AS restart_seq
        |FROM events WHERE event_type = 'view'
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_last_committed" ->
      """SELECT user_id, max(event_id) AS last_seq
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_txn_stats" ->
      """SELECT user_id, count(*) AS n_records, min(event_id) AS first_seq,
        |       max(event_id) AS last_seq,
        |       max(event_id) - min(event_id) AS seq_span
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_asof_snapshot" ->
      """WITH m AS (SELECT max(event_id) AS mx FROM events),
        |s AS (SELECT unnest([mx // 4, mx // 2, (mx * 3) // 4]) AS snap_seq
        |      FROM m),
        |r AS (
        |  SELECT s.snap_seq, e.user_id, e.event_id, e.event_type, e.value,
        |         row_number() OVER (PARTITION BY s.snap_seq, e.user_id
        |                            ORDER BY e.event_id DESC) AS rn
        |  FROM events e JOIN s ON e.event_id <= s.snap_seq)
        |SELECT snap_seq, user_id, event_id AS last_seq, event_type, value
        |FROM r WHERE rn = 1 ORDER BY snap_seq, user_id""".stripMargin,
    "q_latest_per_key" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_updbef_updaft_pair" ->
      """SELECT user_id, event_id, value,
        |       lag(event_id) OVER w AS prev_seq,
        |       lag(value) OVER w AS prev_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "q_rollback_filter" ->
      """SELECT event_id, user_id, event_type FROM events
        |WHERE user_id NOT IN
        |  (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
        |ORDER BY event_id""".stripMargin,
    "q_delete_apply" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q_upsert_merge" ->
      """WITH upd AS (
        |  SELECT o_custkey AS key, o_totalprice AS upd_val FROM (
        |    SELECT o_custkey, o_totalprice,
        |           row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey DESC) AS rn
        |    FROM orders) t WHERE rn = 1),
        |base AS (SELECT c_custkey AS key, c_acctbal AS base_val FROM customer)
        |SELECT coalesce(base.key, upd.key) AS key,
        |       coalesce(upd_val, base_val) AS merged_val
        |FROM base FULL OUTER JOIN upd ON base.key = upd.key
        |ORDER BY key""".stripMargin,
    "q_truncate_apply" ->
      """WITH trunc AS (
        |  SELECT user_id, max(event_id) AS trunc_seq FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id)
        |SELECT e.event_id, e.user_id, e.event_type
        |FROM events e LEFT JOIN trunc t ON e.user_id = t.user_id
        |WHERE t.trunc_seq IS NULL OR e.event_id > t.trunc_seq
        |ORDER BY e.event_id""".stripMargin,
    // SCD2: IS DISTINCT FROM is the SQL spelling of Spark's !(a <=> b);
    // the rn = 1 arm keeps a key's first image unconditionally (a leading
    // NULL image must still open version 1).
    "q_scd2" ->
      """WITH ch AS (
        |  SELECT user_id, event_id, value,
        |         lag(value) OVER (PARTITION BY user_id ORDER BY event_id)
        |           AS prev_value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id)
        |           AS rn
        |  FROM events),
        |vers AS (
        |  SELECT user_id, event_id, value FROM ch
        |  WHERE rn = 1 OR value IS DISTINCT FROM prev_value)
        |SELECT user_id,
        |       cast(row_number() OVER w AS int) AS version,
        |       event_id AS valid_from_seq,
        |       lead(event_id) OVER w AS valid_to_seq,
        |       value,
        |       cast(lead(event_id) OVER w IS NULL AS int) AS is_current
        |FROM vers
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |ORDER BY user_id, version""".stripMargin,
    "q_tumbling_window" ->
      """SELECT cast(date_trunc('hour', ts) AS timestamp) AS hour,
        |       count(*) AS n_events,
        |       cast(sum(cast(value AS decimal(18,2))) AS double) AS sum_value
        |FROM events GROUP BY 1 ORDER BY hour""".stripMargin,
    // Hopping windows: each event belongs to windows starting at its
    // 30-minute bucket and the bucket before it (start <= t < start+1h,
    // start on the 30-minute grid) — materialized via a 2-row expansion.
    "q_hopping_window" ->
      """WITH evts AS (
        |  SELECT cast(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
        |x AS (
        |  SELECT time_bucket(INTERVAL '30 minutes', ts)
        |           - u.k * (INTERVAL '30 minutes') AS w_start,
        |         event_type, value
        |  FROM evts CROSS JOIN (SELECT unnest([0, 1]) AS k) u)
        |SELECT w_start, event_type, count(*) AS n_events,
        |       cast(sum(cast(value AS decimal(18,2))) AS double) AS sum_value
        |FROM x GROUP BY w_start, event_type
        |ORDER BY w_start, event_type""".stripMargin,
    // Gaps-and-islands: a new session starts when the gap from the previous
    // event of the same key is >= 30 min (Spark's session window is
    // half-open [start, last+gap), so an event exactly at the boundary
    // starts a new session). `evts` truncates TIMESTAMP_NS → TIMESTAMP (µs)
    // so gap comparisons see the same values Spark does after Tables.events'
    // ns→µs conversion — a ns-precision gap straddling exactly 30 min would
    // otherwise flip a session boundary between the engines.
    "q_session_window" ->
      """WITH evts AS (
        |  SELECT user_id, cast(ts AS TIMESTAMP) AS ts, value FROM events),
        |marked AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |                   >= INTERVAL 30 MINUTE OR
        |              lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM evts),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT user_id,
        |       cast(date_trunc('second', min(ts)) AS timestamp) AS session_start,
        |       count(*) AS n_events,
        |       cast(sum(cast(value AS decimal(18,2))) AS double) AS sum_value
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    // Snapshot states replayed with window ranking (vs Spark's one-pass
    // conditional max_by — same states, different plan on purpose). oldp /
    // newp are never NULL: `x IS NOT NULL AND ...` is FALSE AND NULL =
    // FALSE when the join side is absent.
    "q_snapshot_diff" ->
      """WITH filt AS (
        |  SELECT user_id, event_id, event_type, value FROM events
        |  WHERE event_type IN ('purchase', 'error')),
        |snap_old AS (
        |  SELECT user_id, event_id, event_type, value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id
        |                                 ORDER BY event_id DESC) AS rn
        |    FROM filt WHERE event_id <= 5000) t WHERE rn = 1),
        |snap_new AS (
        |  SELECT user_id, event_id, event_type, value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id
        |                                 ORDER BY event_id DESC) AS rn
        |    FROM filt) t WHERE rn = 1),
        |j AS (
        |  SELECT coalesce(o.user_id, n.user_id) AS user_id,
        |         (o.user_id IS NOT NULL AND o.event_type = 'purchase') AS oldp,
        |         (n.user_id IS NOT NULL AND n.event_type = 'purchase') AS newp,
        |         o.value AS ov, n.value AS nv,
        |         o.event_id AS os, n.event_id AS ns
        |  FROM snap_old o FULL OUTER JOIN snap_new n ON o.user_id = n.user_id),
        |c AS (
        |  SELECT user_id,
        |         CASE WHEN NOT oldp AND newp THEN 'insert'
        |              WHEN oldp AND NOT newp THEN 'delete'
        |              WHEN oldp AND newp AND ov <> nv THEN 'update' END AS op,
        |         CASE WHEN oldp THEN ov END AS old_value,
        |         CASE WHEN newp THEN nv END AS new_value,
        |         CASE WHEN oldp THEN os END AS old_seq,
        |         CASE WHEN newp THEN ns END AS new_seq
        |  FROM j)
        |SELECT * FROM c WHERE op IS NOT NULL ORDER BY user_id""".stripMargin,
    // The IVM invariant: merge(base MV, delta) must equal the full
    // recompute over the whole log — so the oracle IS the recompute.
    // Sums ride decimal end-to-end on both sides; avg is derived from the
    // merged sum/count with the same double division.
    "q_mv_delta" ->
      """SELECT user_id, count(*) AS n_events,
        |       cast(sum(cast(value AS decimal(18,2))) AS double) AS sum_value,
        |       cast(sum(cast(value AS decimal(18,2))) AS double) / count(*)
        |         AS avg_value,
        |       max(event_id) AS last_seq
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
