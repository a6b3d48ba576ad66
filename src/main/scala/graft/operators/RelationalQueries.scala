package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator inventory (SURVEY.md §2.b): scan/project, filter,
  * typed decode, date/string/decimal/JSON functions, joins, aggregates,
  * rollup, top-k, set ops.
  *
  * Determinism rules for DuckDB-oracle parity (and for reproducible results
  * at any scale): every query ends in a total ORDER BY; sums over doubles go
  * through decimal (exact, order-independent); averages are computed as
  * exact-decimal sum divided once by count (single IEEE op ⇒ bit-stable
  * regardless of partitioning).
  */
object RelationalQueries {

  /** Projection pushdown — the capture column list (ec:2042-2044). The plan
    * must show ReadSchema with only these columns. */
  private def qScanProject(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy(col("event_id"))

  /** Predicate pushdown on the sort key — discard records below the last
    * committed LSN (discard_candidate, ec:1459-1461). Plan must show
    * PushedFilters on event_id. */
  private def qFilterSeq(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("event_id") >= 500 && col("event_type") =!= "error")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))

  /** Typed column decode — every scalar type of §1.3 incl. the DECIMAL and
    * DATETIME paths the reference disabled (ec:1031-1040, 1075-1084). */
  private def qDecodeTypes(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 1000)
      .select(
        col("l_orderkey"),
        col("l_linenumber").cast("smallint").as("v_smallint"),
        col("l_linenumber").cast("int").as("v_int"),
        (col("l_orderkey") * 1000000L).cast("bigint").as("v_bigint"),
        col("l_quantity").cast("decimal(32,16)").cast("double").as("v_decimal"),
        col("l_extendedprice").cast("double").as("v_double"),
        col("l_discount").cast("float").cast("double").as("v_float_as_double"),
        col("l_shipdate").cast("date").as("v_date"),
        col("l_shipdate").cast("timestamp").as("v_timestamp"),
        (col("l_returnflag") === "R").as("v_bool"))
      .orderBy(col("l_orderkey"), col("v_smallint"))

  /** Julian-day date decode analog (rjulmdy, ec:863-886): day-offset
    * arithmetic from an epoch plus calendar part extraction. */
  private def qDateJulian(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("event_id") < 2000)
      .select(
        col("event_id"),
        date_add(lit(java.sql.Date.valueOf("1899-12-31")),
          (col("event_id") % 40000).cast("int")).as("v_date"))
      .withColumn("v_year", year(col("v_date")))
      .withColumn("v_month", month(col("v_date")))
      .withColumn("v_day", dayofmonth(col("v_date")))
      .orderBy(col("event_id"))

  /** CHAR/VARCHAR semantics (ec:899-954): pad/trim/length/case/substring/
    * concat. Mirrors the blank-padded CHAR normalize-on-decode decision
    * (SURVEY.md §7.4.4): rtrim applied before compare. */
  private def qStringFuncs(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("v_upper"),
        lower(col("c_mktsegment")).as("v_lower"),
        length(col("c_name")).cast("int").as("v_len"),
        substring(col("c_name"), 1, 8).as("v_sub"),
        concat(col("c_mktsegment"), lit("-"), col("c_name")).as("v_concat"),
        rtrim(concat(col("c_name"), lit("   "))).as("v_rtrim"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("v_lpad"))
      .orderBy(col("c_custkey"))

  /** DECIMAL(32,16) done right (the reference returns "0.0" — ec:1029-1066):
    * exact decimal aggregation. */
  private def qDecimalAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double").as("sum_price"),
        // scale 2, not 16: DuckDB's decimal→double cast double-rounds when
        // the unscaled value exceeds 2^53, so keep aggregate scales low.
        sum(col("l_quantity").cast("decimal(18,2)"))
          .cast("double").as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .withColumn("avg_price",
        (col("sum_price").cast("double") / col("n_rows")).as("avg_price"))
      .orderBy(col("l_returnflag"))

  /** In-band metadata parse — TABSCHEM cols_desc analog (ec:1346) over the
    * events.props JSON column. */
  private def qJsonProps(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), min(col("event_id")).as("first_seq"))
      .orderBy(col("k"))

  /** tabid → tabname registry lookup (ec:1247, 450-474): broadcast hash
    * join of the stream against a small dimension — the O(1) array lookup
    * of the reference, distributed. */
  private def qLookupJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .withColumn("n_key", (col("user_id") % 25).cast("int"))
    val dim = Tables.nation(s, d)
    ev.join(broadcast(dim), ev("n_key") === dim("n_nationkey"))
      .select(col("event_id"), col("user_id"), col("n_name"))
      .orderBy(col("event_id"))
  }

  /** Registry + base-table enrichment generalized: 4-way join
    * lineitem ⋈ orders ⋈ customer ⋈ nation with exact-decimal revenue.
    * At scale: lineitem⋈orders shuffles on orderkey; customer is
    * fact-proportional (15M rows at TPC-H sf100), so no broadcast hint —
    * AQE picks broadcast when it fits and demotes to shuffle join when it
    * doesn't. Only nation (25 rows, bounded) is hinted. */
  private def qMultiwayJoin(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_items"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,6)")).cast("double").as("revenue"))
      .orderBy(col("n_name"))
  }

  /** Tail of the stream — highest LSNs (TakeOrderedAndProject): top-k
    * without a total sort. */
  private def qTopkSeq(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .orderBy(col("event_id").desc)
      .limit(100)
      .select(col("event_id"), col("user_id"), col("event_type"))

  /** Changed-keys reconciliation: UNION / INTERSECT / EXCEPT on key sets. */
  private def qSetOps(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    def keys(t: String) = ev.filter(col("event_type") === t).select(col("user_id"))
    keys("click").intersect(keys("purchase"))
      .except(keys("error"))
      .union(keys("signup").intersect(keys("view")))
      .distinct()
      .orderBy(col("user_id"))
  }

  /** TPC-H-Q1-style multi-measure aggregate (the all-types workout). */
  private def qGroupedMeasures(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)"))
          .cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double").as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,6)")).cast("double").as("sum_disc_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax")))
          .cast("decimal(18,6)")).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty",
        col("sum_qty").cast("double") / col("count_order"))
      .withColumn("avg_price",
        col("sum_base_price").cast("double") / col("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Per-table/per-type change counts at multiple grains (ROLLUP). */
  private def qRollup(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("user_bucket", (col("user_id") % 5).cast("int"))
      .rollup(col("event_type"), col("user_bucket"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy(asc_nulls_first("event_type"), asc_nulls_first("user_bucket"))

  /** CUBE: change counts at EVERY grain combination — the grouping-sets
    * family completed beside [[qRollup]] (ROLLUP emits the prefix grains;
    * CUBE adds the (null, user_bucket) slices). Same single hash
    * aggregation: Spark expands the row to its 4 grouping sets before the
    * partial agg, so the shuffle carries per-set partials, never a
    * re-scan per grain. */
  private def qCube(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("user_bucket", (col("user_id") % 5).cast("int"))
      .cube(col("event_type"), col("user_bucket"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy(asc_nulls_first("event_type"), asc_nulls_first("user_bucket"))

  /** Staged funnel core, the ONE implementation behind the driver query
    * and [[graft.api.Graft.funnel]]: per entity, the deepest stage of
    * `stages` reached in `orderCol` order, each stage anchored at the
    * FIRST qualifying event no more than `window` order units after the
    * previous stage's anchor. Returns one row per entity: (entity id,
    * stage ∈ [0, stages.length]).
    *
    * Shape: ONE hash shuffle collects each entity's (order, type) pairs —
    * never other columns — then the stage anchors are map-side
    * higher-order list algebra (filter / transform / array_min chained
    * through the anchors; an unreached stage yields a null anchor, whose
    * bound predicate nulls out and drops later candidates, identically in
    * DuckDB's list_filter). Deterministic regardless of collect order:
    * every anchor is a min over a filtered set. Anchors are monotone
    * (stage i reached ⇒ stage i-1 reached), so the deepest stage is the
    * first non-null anchor scanning backwards.
    *
    * Hot-key guard (VERDICT r8 #5): the collected array is NOT the
    * entity's full history. The anchor chain is deterministic and
    * bounded — a₀ is the entity's min stage-0 order, and aᵢ ∈
    * (a₀, a₀ + i·window] — so only stage-typed events with order inside
    * [a₀, a₀ + (len−1)·window] can influence any anchor. Both prunes run
    * BEFORE the collect: the type filter map-side on the scan, the
    * horizon filter against the (one row per entity) a₀ aggregate. A
    * hot entity (bot user, null-ish key) with 10⁸ events materializes
    * only its horizon slice in the array; entities with no stage-0
    * event never reach the collect at all and are re-attached as
    * stage 0. The residual bound is events-per-entity WITHIN one
    * horizon, which `window` controls — that is the knob to shrink if a
    * key is hot inside the funnel window itself. */
  private[graft] def funnelStages(events: DataFrame, userCol: String,
      orderCol: String, typeCol: String, stages: Seq[String],
      window: Long): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val evs = events.select(col(userCol).as("_fun_user"),
      col(orderCol).as("_fun_ord"), col(typeCol).as("_fun_typ"))
    val staged = evs.filter(col("_fun_typ").isin(stages: _*))
    val a0 = staged.filter(col("_fun_typ") === lit(stages.head))
      .groupBy(col("_fun_user"))
      .agg(min(col("_fun_ord")).as("_fun_first"))
      .select(col("_fun_user").as("_fun_zuser"), col("_fun_first"))
    // null-safe join keys: a null entity id is still an entity (the
    // hot-key class this guard exists for), and must funnel identically
    // to the unpruned form
    val pruned = staged.join(a0, col("_fun_user") <=> col("_fun_zuser"))
      .filter(col("_fun_ord") >= col("_fun_first") &&
        col("_fun_ord") <= col("_fun_first") + lit((stages.length - 1) * window))
    val collected = pruned
      .groupBy(col("_fun_user"))
      .agg(collect_list(struct(col("_fun_ord").as("ord"),
        col("_fun_typ").as("typ"))).as("_fun_evs"))
    val withAnchors = stages.zipWithIndex.foldLeft(collected) {
      case (df, (stage, i)) =>
        val pred: Column => Column =
          if (i == 0) e => e.getField("typ") === lit(stage)
          else e => e.getField("typ") === lit(stage) &&
            e.getField("ord") > col(s"_fun_a${i - 1}") &&
            e.getField("ord") <= col(s"_fun_a${i - 1}") + lit(window)
        df.withColumn(s"_fun_a$i", array_min(
          transform(filter(col("_fun_evs"), pred), e => e.getField("ord"))))
    }
    // Build innermost-first: the LAST fold step wraps the accumulator, so
    // ascending order puts the DEEPEST stage's check outermost — a user at
    // stage 3 must not be reported as stage 1 just because a0 is non-null.
    val stageCol = stages.indices.foldLeft(lit(0)) { (acc, i) =>
      when(col(s"_fun_a$i").isNotNull, lit(i + 1)).otherwise(acc)
    }
    val stagedOut = withAnchors.select(col("_fun_user").as("_fun_puser"),
      stageCol.cast("int").as("_fun_stage"))
    evs.select(col("_fun_user")).distinct()
      .join(stagedOut, col("_fun_user") <=> col("_fun_puser"), "left")
      .select(col("_fun_user").as(userCol),
        coalesce(col("_fun_stage"), lit(0)).cast("int").as("stage"))
  }

  /** Conversion funnel in log order: per user, the first 'view', the
    * first 'click' within 300 LSNs after it, the first 'purchase' within
    * 300 LSNs after that — staged sequential-pattern matching (the
    * product-analytics staple), counted per deepest stage reached. Order
    * is the stream's total LSN order (`event_id`), the same clock every
    * CDC query here uses. The staging engine is [[funnelStages]]. */
  private def qFunnel(s: SparkSession, d: String): DataFrame =
    funnelStages(Tables.events(s, d), "user_id", "event_id", "event_type",
        Seq("view", "click", "purchase"), window = 300L)
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("stage"))

  /** Retention cohorts (r10, VERDICT r9 #6): the other product-analytics
    * staple beside the funnel — group users by the period of their FIRST
    * event (the cohort), then count how many of each cohort are still
    * active 0, 1, 2, … periods later.
    *
    * Plan shape (the 100 TB story): ONE hash exchange on the entity id
    * computes the cohort anchor (`min(period)`) AND the distinct active
    * periods (`collect_set(period)`) together — no self-join of the event
    * log against its own first-seen table, and the shuffle carries only
    * (id, period) pairs, never event payloads. `collect_set` partial
    * state is bounded by the number of DISTINCT periods (weeks in the
    * retention horizon — tens, not event counts), so map-side combine
    * caps the exchange at |users| × |weeks| rows regardless of event
    * volume. A second exchange aggregates the exploded (cohort, offset)
    * grid, after which the grid is |cohorts| × |offsets| — the window
    * that stamps each cohort's size onto its rows runs over that tiny
    * table, not the log. */
  private[graft] def retentionCohorts(events: DataFrame, userCol: String,
      tsCol: String, period: String): DataFrame = {
    val perUser = events
      .filter(col(userCol).isNotNull)
      .select(col(userCol).as("_rc_user"),
        date_trunc(period, col(tsCol)).cast("date").as("_rc_wk"))
      .groupBy(col("_rc_user"))
      .agg(min(col("_rc_wk")).as("cohort_week"),
        collect_set(col("_rc_wk")).as("_rc_weeks"))
    val grid = perUser
      .select(col("cohort_week"), explode(col("_rc_weeks")).as("_rc_wk"))
      .groupBy(col("cohort_week"),
        (datediff(col("_rc_wk"), col("cohort_week")) / 7).cast("int")
          .as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
    // Every user is active in their own first period, so the cohort's
    // size IS its offset-0 row — a window over the aggregated grid, not
    // another pass over the log. Counts stay integers (engine-exact);
    // callers divide for the retention ratio.
    grid.withColumn("cohort_size",
      max(when(col("week_offset") === 0, col("n_users")))
        .over(Window.partitionBy(col("cohort_week"))))
  }

  /** Weekly N-week retention cohorts over the change stream: users
    * cohorted by the week of their first event, with the count still
    * active k weeks later and the cohort's size. Week buckets are
    * Monday-start `date_trunc` in both engines. */
  private def qRetentionCohort(s: SparkSession, d: String): DataFrame =
    retentionCohorts(Tables.events(s, d), "user_id", "ts", "week")
      .orderBy(col("cohort_week"), col("week_offset"))

  /** Cohort LTV curve (r11): cumulative purchase revenue per weekly
    * cohort by week offset, normalized per cohort member — the
    * lifetime-value read that prices acquisition (`q_retention_cohort`
    * says WHO comes back; this says what their return is WORTH). A
    * cohort's LTV at offset k = cumulative revenue through week k over
    * the cohort's size, in exact micros.
    *
    * 100 TB shape: one (user, week) hash aggregation collapses purchases
    * to the weekly grain; one user-keyed aggregation anchors each user's
    * cohort (ALL events, not just purchases — a non-buying member still
    * dilutes LTV); the grid join carries (user, week, micros) only.
    * Everything after runs on the cohort × offset grid: the cumulative
    * sum is a window over ≤ weeks rows per cohort, cohort size joins
    * from the anchor aggregation. */
  private[graft] def cohortLtv(events: DataFrame): DataFrame = {
    val anchors = events
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("_w"))
      .groupBy(col("user_id")).agg(min(col("_w")).as("cohort_week"))
    val sizes = anchors.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    val uw = events
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("_w"),
        expr("cast(round(value * 1000000) AS bigint)").as("_vm"))
      .groupBy(col("user_id"), col("_w")).agg(sum(col("_vm")).as("_rev"))
    val grid = uw.join(anchors, Seq("user_id"))
      .groupBy(col("cohort_week"),
        expr("cast(datediff(_w, cohort_week) div 7 AS bigint)")
          .as("week_offset"))
      .agg(count(lit(1)).as("n_buyers"), sum(col("_rev")).as("rev_micro"))
    val w = Window.partitionBy(col("cohort_week")).orderBy(col("week_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("cum_rev_micro", sum(col("rev_micro")).over(w))
      .join(sizes, Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("n_buyers"),
        col("rev_micro"), col("cum_rev_micro"), col("cohort_size"),
        expr("cum_rev_micro div cohort_size").as("ltv_micro"))
  }

  private def qLtv(s: SparkSession, d: String): DataFrame =
    cohortLtv(Tables.events(s, d))
      .orderBy(col("cohort_week"), col("week_offset"))

  /** The percentile cuts [[qConcentration]] reports. */
  private val ConcPcts: Seq[Int] = Seq(1, 5, 10, 20)

  /** Revenue concentration (r11): the share of total purchase revenue
    * held by the top 1/5/10/20% of users — the "do whales carry the
    * business" read that decides whether churn risk is a tail problem or
    * a head problem (and the same shape that finds skewed keys before a
    * join strategy is chosen).
    *
    * Determinism: users rank on the (revenue DESC, user_id) TOTAL order;
    * the top-N cut is `ceil(n·p/100)` in integer arithmetic
    * (`(n·p + 99) div 100`); shares are integer micro-divisions of exact
    * long cumulative sums.
    *
    * 100 TB shape: ONE user-keyed hash aggregation collapses the log;
    * the rank + cumulative windows then sort the USER table (the q_rfm
    * caveat — at extreme user counts the cuts come from sketch
    * quantiles); the report join probes 4 rank positions. */
  private[graft] def revenueConcentration(events: DataFrame): DataFrame = {
    val users = events
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase",
        expr("cast(round(value * 1000000) AS bigint)")).otherwise(0L))
        .as("_rev"))
    val w = Window.orderBy(col("_rev").desc, col("user_id"))
    val ranked = users
      .withColumn("_rn", row_number().over(w))
      .withColumn("_cum", sum(col("_rev")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val totals = users.agg(count(lit(1)).as("_n"), sum(col("_rev")).as("_r"))
    val ks = events.sparkSession.createDataFrame(ConcPcts.map(Tuple1(_)))
      .toDF("pct")
    ks.crossJoin(broadcast(totals))
      .withColumn("top_n", expr("(_n * pct + 99) div 100"))
      .join(ranked, col("_rn") === col("top_n"))
      .select(col("pct"), col("top_n"),
        expr("_cum * 1000000 div _r").as("rev_share_micro"))
      .orderBy(col("pct"))
  }

  private def qConcentration(s: SparkSession, d: String): DataFrame =
    revenueConcentration(Tables.events(s, d))

  /** PIVOT: per-user event-type counts as columns. Spark's `pivot` with an
    * explicit value list compiles to one hash aggregation with conditional
    * partials (no extra shuffle, no value-discovery pass) — same plan the
    * oracle's manual conditional aggregation describes. */
  private def qPivot(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("user_id"))

  /** Quantiles per group: exact `percentile` (sort-based, linear
    * interpolation — the same definition as DuckDB's quantile_cont),
    * rounded to 6 dp at the output edge (oracle-parity note above).
    * Exact quantiles buffer each group's values; at 100 TB the scale path
    * is `approx_percentile` (bounded-memory KLL-style sketch, mergeable
    * map-side) — same query shape, swapped aggregate, no exact oracle. */
  private def qPercentiles(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"))
      .orderBy(col("event_type"))

  /** Frame-bounded rolling aggregates per key: 3-row moving sum and a
    * running (cumulative) sum over the LSN order. Decimal-exact inside the
    * frames (doubles summed by a window can associate differently across
    * engines), double at the output edge. One shuffle on the key. */
  private def qMovingAgg(s: SparkSession, d: String): DataFrame = {
    val byKey = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("event_id"))
    val vDec = col("value").cast("decimal(18,6)")
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("value"), vDec.as("v_dec"))
      .withColumn("mov_sum_3",
        sum(col("v_dec")).over(byKey.rowsBetween(-2, 0)).cast("double"))
      .withColumn("run_sum",
        sum(col("v_dec")).over(byKey.rowsBetween(Long.MinValue, 0)).cast("double"))
      .select(col("user_id"), col("event_id"), col("value"),
        col("mov_sum_3"), col("run_sum"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** The profiled columns of `events`, shared by [[qProfile]] and its
    * generated oracle so the two engines' profile expressions can never
    * drift: (name, spark expr, duck expr, isNumeric). `ts` profiles as
    * epoch micros (both engines see the µs-truncated value). */
  private val ProfileCols: Seq[(String, String, String, Boolean)] = Seq(
    ("event_id", "event_id", "event_id", true),
    ("user_id", "user_id", "user_id", true),
    ("event_type", "event_type", "event_type", false),
    ("value", "value", "value", true),
    ("props", "props", "props", false),
    ("ts", "unix_micros(ts)", "epoch_us(cast(ts AS TIMESTAMP))", true))

  /** One-pass data profiling — the SUMMARIZE-style data-quality gate a
    * pipeline runs before trusting a new drop: per column, row/null/
    * distinct counts and min/max (numeric columns in `min_num`/`max_num`,
    * string columns lexicographically in `min_str`/`max_str`).
    *
    * Shape: ONE scan, one aggregation, then a 6-way `stack` unpivot of
    * the single wide row — never a per-column rescan. The exact
    * multi-column distinct plans as Spark's Expand (×|cols| rows into
    * one shuffle); at 100 TB swap `approx_count_distinct` into the same
    * frame (fixed-size HLL sketches, no Expand) — the demo keeps the
    * exact form because the oracle can replicate it bit-for-bit. */
  /** The generic profiler core: `specs` = (name, spark expr, isNumeric).
    * `exact = false` swaps the distinct counts for HyperLogLog++ sketches
    * (rsd 2%) — fixed-size mergeable state, no Expand — the form the same
    * frame runs at 100 TB. */
  private[graft] def profileCore(df: DataFrame,
      specs: Seq[(String, String, Boolean)], exact: Boolean): DataFrame = {
    require(specs.nonEmpty, "profile: no columns given")
    val aggs = specs.flatMap { case (n, e, isNum) => Seq(
      expr(s"count($e)").as(s"nn_$n"),
      expr(if (exact) s"count(DISTINCT $e)"
        else s"approx_count_distinct($e, 0.02)").as(s"nd_$n"),
      expr(if (isNum) s"cast(min($e) AS double)" else "cast(NULL AS double)")
        .as(s"mnn_$n"),
      expr(if (isNum) s"cast(max($e) AS double)" else "cast(NULL AS double)")
        .as(s"mxn_$n"),
      expr(if (isNum) "cast(NULL AS string)" else s"min($e)").as(s"mns_$n"),
      expr(if (isNum) "cast(NULL AS string)" else s"max($e)").as(s"mxs_$n"))
    } :+ count(lit(1)).as("n_rows")
    val unpivot = specs.map { case (n, _, _) =>
      s"'$n', nn_$n, nd_$n, mnn_$n, mxn_$n, mns_$n, mxs_$n"
    }.mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("n_rows"), expr(
        s"stack(${specs.size}, $unpivot) AS " +
          "(col_name, n_nonnull, n_distinct, min_num, max_num, min_str, max_str)"))
      .select(col("col_name"), col("n_rows"),
        (col("n_rows") - col("n_nonnull")).as("n_null"), col("n_distinct"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"))
  }

  private def qProfile(s: SparkSession, d: String): DataFrame =
    profileCore(Tables.events(s, d),
      ProfileCols.map { case (n, e, _, isNum) => (n, e, isNum) },
      exact = true)
      .orderBy(col("col_name"))

  /** The ranking-function family in one pass (r9): rank / dense_rank
    * over the value ordering (ties share a rank — deterministic), and
    * percent_rank / cume_dist / ntile over the (value, id) TOTAL order
    * (ntile assigns by row position, so a tie-broken order is the only
    * engine-portable form; percent_rank and cume_dist are rank
    * arithmetic over exact integers, IEEE-identical). Both window specs
    * share one partition key, so the plan is ONE exchange with the
    * window passes stacked — the q_scd2 shape. */
  private def qRankFuncs(s: SparkSession, d: String): DataFrame = {
    val byVal = Window.partitionBy(col("event_type"))
      .orderBy(col("value"))
    val total = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    Tables.events(s, d)
      .select(col("event_type"), col("event_id"), col("value"))
      .withColumn("rnk", rank().over(byVal))
      .withColumn("drnk", dense_rank().over(byVal))
      .withColumn("prnk", round(percent_rank().over(total), 6))
      .withColumn("cdist", round(cume_dist().over(total), 6))
      .withColumn("quartile", ntile(4).over(total))
      .orderBy(col("event_type"), col("value"), col("event_id"))
  }

  /** Last-touch attribution (r11): every purchase attributed to the most
    * recent PRECEDING click by the same user within a 300-LSN horizon —
    * the product-analytics staple between `q_funnel` (staged counts) and
    * `q_asof_join` (two-table as-of): one stream, self-referential,
    * per-event output. Purchases with no click inside the horizon emit
    * with a null attribution (they must surface — "unattributed revenue"
    * is the number the report exists for).
    *
    * 100 TB shape: ONE hash exchange on the user key; the carried click
    * is `last(... ignore nulls)` over the running frame — no self-join of
    * the log, no per-purchase scan-back. The window state is one value
    * per user; payload columns beyond (id, type, value) never load. */
  private def qAttribution(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .withColumn("_last_click",
        last(when(col("event_type") === "click", col("event_id")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id").as("purchase_id"),
        col("user_id"),
        when(col("event_id") - col("_last_click") <= 300, col("_last_click"))
          .as("click_id"),
        when(col("event_id") - col("_last_click") <= 300,
          col("event_id") - col("_last_click")).as("gap"),
        col("value").as("amount"))
      .orderBy(col("purchase_id"))
  }

  /** The measures [[qCorr]] correlates, and the pair grid. */
  private val CorrCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
  private val CorrPairs: Seq[(String, String)] =
    for { i <- CorrCols.indices; j <- CorrCols.indices if i < j }
      yield (CorrCols(i), CorrCols(j))

  /** The Pearson-r scalar tail, shared TEXT between the Spark arm and the
    * DuckDB oracle arm: identical IEEE ops in identical order over the
    * same exact-integer moment sums, so the 6-dp round can't drift.
    * Shared with [[SeriesOps]]' lag-autocorrelation, which is the same
    * formula over (y_t, y_t−k) pairs. */
  private[operators] def corrFormula(n: String, sx: String, sy: String,
      sxx: String, syy: String, sxy: String): String =
    s"round((cast($n AS double) * cast($sxy AS double) - cast($sx AS double) * cast($sy AS double)) / " +
      s"(sqrt(cast($n AS double) * cast($sxx AS double) - cast($sx AS double) * cast($sx AS double)) * " +
      s"sqrt(cast($n AS double) * cast($syy AS double) - cast($sy AS double) * cast($sy AS double))), 6)"

  /** Pairwise Pearson correlation matrix over the lineitem measures
    * (r11) — the dependence panel beside [[qProfile]]'s per-column stats:
    * which measures move together is the first question a feature audit
    * or a downstream model owner asks of a new data drop.
    *
    * Determinism: every measure quantizes to exact 1e-6-unit integers at
    * the scan (the q_zscore rule), so ALL ten moment sums (Σx, Σx², Σxy)
    * are associative integer aggregates carried in decimal(38,0) —
    * partitioning cannot move them, and double summation order never
    * arises. The r formula itself is one shared expression text
    * ([[corrFormula]]) evaluated over the exact sums in both engines.
    *
    * 100 TB shape: ONE scan, ONE aggregation — all 4 + 4 + 6 moments fold
    * map-side into a single row (fixed-width state, map-side combine);
    * the 6 output rows explode from that row. No per-pair rescan, no
    * shuffle wider than one row. */
  private def qCorr(s: SparkSession, d: String): DataFrame = {
    val quant = CorrCols.map(c => s"cast(round($c * 1000000) AS bigint) AS ${c}_m")
    val aggs = CorrCols.flatMap(c => Seq(
      expr(s"sum(cast(${c}_m AS decimal(38,0))) AS s_$c"),
      expr(s"sum(cast(${c}_m AS decimal(38,0)) * ${c}_m) AS ss_$c"))) ++
      CorrPairs.map { case (a, b) =>
        expr(s"sum(cast(${a}_m AS decimal(38,0)) * ${b}_m) AS sp_${a}_$b")
      } :+ count(lit(1)).as("n")
    val arms = CorrPairs.map { case (a, b) =>
      s"struct('$a' AS x_col, '$b' AS y_col, n, " +
        corrFormula("n", s"s_$a", s"s_$b", s"ss_$a", s"ss_$b", s"sp_${a}_$b") +
        " AS corr)"
    }
    // spread: the test files are single-row-group parquet (one scan
    // partition), and the decimal moment arithmetic is the per-row cost —
    // without redistribution the whole aggregation runs on one core
    Tables.spread(s, Tables.lineitem(s, d).selectExpr(quant: _*))
      .agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"explode(array(${arms.mkString(", ")})) AS p")
      .select(col("p.x_col").as("x_col"), col("p.y_col").as("y_col"),
        col("p.n").as("n"), col("p.corr").as("corr"))
      .orderBy(col("x_col"), col("y_col"))
  }

  /** Event-type transition matrix (r11): counts and probabilities of
    * `from_type → to_type` over each user's LSN-ordered event sequence —
    * the first-order Markov view of user behavior (what follows a view?
    * how often does an error precede churn?), the aggregate the funnel
    * and attribution queries are point-reads of.
    *
    * 100 TB shape: ONE hash exchange on the user key for the `lead`
    * window, then one bounded (|types|²) hash aggregation; the
    * probability is an integer micro-division against the from-type row
    * total (a window over the tiny matrix). Payload columns never load. */
  private def qTransitions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"))
      .withColumn("_next", lead(col("event_type"), 1).over(w))
      .filter(col("_next").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("_next").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p_micro",
        expr("n * 1000000 div sum(n) OVER (PARTITION BY from_type)"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Two-proportion A/B significance gate (r11): conversion (purchase
    * share) of variant A (`user_id % 2 = 0`) vs B, with the pooled
    * two-proportion z statistic — the go/no-go number an experiment
    * readout leads with. Counts are exact integers out of ONE
    * aggregation (variant splits as conditional sums — the q_dsir
    * trick); the z formula is one shared expression text over those
    * integers, IEEE-identical in both engines, rounded at the edge. */
  private val abZFormula: String =
    // p1 = x1/n1, p2 = x2/n2, pooled p = (x1+x2)/(n1+n2)
    "round((cast(x1 AS double) / cast(n1 AS double) - cast(x2 AS double) / cast(n2 AS double)) / " +
      "sqrt((cast(x1 + x2 AS double) / cast(n1 + n2 AS double)) * " +
      "(1.0 - cast(x1 + x2 AS double) / cast(n1 + n2 AS double)) * " +
      "(1.0 / cast(n1 AS double) + 1.0 / cast(n2 AS double))), 6)"

  private def qAbTest(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(
        (col("user_id") % 2 === 0).as("_a"),
        (col("event_type") === "purchase").as("_c"))
      .agg(
        sum(when(col("_a"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("_a") && col("_c"), 1L).otherwise(0L)).as("x1"),
        sum(when(!col("_a"), 1L).otherwise(0L)).as("n2"),
        sum(when(!col("_a") && col("_c"), 1L).otherwise(0L)).as("x2"))
      .withColumn("z", expr(abZFormula))
      .withColumn("significant_95", expr("abs(z) >= 1.959964"))
      .select(col("n1"), col("x1"), col("n2"), col("x2"), col("z"),
        col("significant_95"))

  /** Equi-width histogram of the value measure (r11): 20 data-driven bins
    * over the micro-quantized domain — the distribution panel beside
    * [[qProfile]]'s min/max (a profile says the range; the histogram says
    * where the mass sits, which is what sizing a skew strategy or choosing
    * bucket bounds actually needs).
    *
    * Exactness: bin assignment is pure integer arithmetic over
    * micro-quantized longs — `(vm − v0) · 20 div (v1 − v0 + 1)` — with the
    * `+1` guaranteeing the max value lands in bin 19 (the q_zorder bucket
    * formula); per-bin min/max report the OBSERVED micro bounds, so no
    * derived-edge float ever appears. Empty bins are absent in both
    * engines by the same rule.
    *
    * 100 TB shape: one 1-row bounds aggregation broadcast onto the scan,
    * the bin code map-side, then ONE ≤20-group hash aggregation with
    * map-side combine. Nothing sorts, nothing shuffles wider than the
    * bins. */
  private[graft] def valueHistogram(events: DataFrame, nBins: Int): DataFrame = {
    val q = events
      .select(expr("cast(round(value * 1000000) AS bigint)").as("_vm"))
    val bounds = q.agg(min(col("_vm")).as("_v0"), max(col("_vm")).as("_v1"))
    q.crossJoin(broadcast(bounds))
      .groupBy(expr(s"(_vm - _v0) * $nBins div (_v1 - _v0 + 1)").as("bin"))
      .agg(count(lit(1)).as("n"),
        min(col("_vm")).as("min_micro"), max(col("_vm")).as("max_micro"))
  }

  private def qHistogram(s: SparkSession, d: String): DataFrame =
    valueHistogram(Tables.events(s, d), 20).orderBy(col("bin"))

  /** Top opening paths (r11): each user's first three event types joined
    * `a>b>c`, counted across users, top-10 — the "how do journeys start"
    * product-analytics read beside the funnel (which fixes the stages) and
    * the transition matrix (which forgets position).
    *
    * Determinism: the prefix cut is `row_number ≤ 3` over the (user,
    * event_id) total order; the path string assembles from
    * `array_sort(struct(event_id, type))`, so collect order can't matter;
    * the top-10 cut orders by (count DESC, path) — total.
    *
    * 100 TB shape: the window's user-key exchange is the one data-scaled
    * shuffle, and WindowGroupLimit prunes each user's stream to 3 rows
    * inside it; the per-user path agg REUSES that partitioning (no second
    * exchange before the path roll-up, which shuffles ≤ |users| short
    * strings); top-10 is TakeOrderedAndProject. Payload columns never
    * load. */
  private[graft] def pathTopk(events: DataFrame, prefixLen: Int,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    events
      .select(col("user_id"), col("event_id"), col("event_type"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= prefixLen)
      .groupBy(col("user_id"))
      .agg(expr(
        "array_join(transform(array_sort(collect_list(struct(event_id, event_type))), x -> x.event_type), '>')")
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(k)
  }

  private def qPathTopk(s: SparkSession, d: String): DataFrame =
    pathTopk(Tables.events(s, d), 3, 10)

  /** The k thresholds [[qKAnonymity]] reports. */
  private val AnonKs: Seq[Int] = Seq(2, 5, 10, 100)

  /** k-anonymity audit (r11): the privacy gate beside `q_pii_scrub`'s
    * redaction — bucket every event into its quasi-identifier class
    * (event type × day × value decile-ish band: the attributes a linkage
    * attacker joins on) and report, for each k, how many classes and rows
    * sit below k-anonymity. A release gate reads one row of this and
    * decides whether the QI grain needs coarsening.
    *
    * 100 TB shape: ONE hash aggregation to the QI-class grain (the only
    * data-scaled shuffle — counts, never payloads), then one single-row
    * conditional-sum aggregation over the class table with the per-k rows
    * exploded from that row (the q_corr arms trick — no per-k rescan of
    * anything). */
  private[graft] def kAnonymityCurve(events: DataFrame): DataFrame = {
    val classes = events
      .groupBy(col("event_type"), to_date(col("ts")).as("_day"),
        expr("cast(round(value * 1000000) AS bigint) div 100000000").as("_vb"))
      .agg(count(lit(1)).as("_n"))
    val aggs = count(lit(1)).as("n_classes") +:
      AnonKs.flatMap(k => Seq(
        sum(when(col("_n") < k, 1L).otherwise(0L)).as(s"_cb$k"),
        sum(when(col("_n") < k, col("_n")).otherwise(0L)).as(s"_rb$k")))
    val arms = AnonKs
      .map(k => s"struct($k AS k, n_classes, _cb$k AS classes_below, _rb$k AS rows_at_risk)")
      .mkString(", ")
    classes.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"explode(array($arms)) AS p")
      .select(col("p.k").as("k"), col("p.n_classes").as("n_classes"),
        col("p.classes_below").as("classes_below"),
        col("p.rows_at_risk").as("rows_at_risk"))
      .orderBy(col("k"))
  }

  private def qKAnonymity(s: SparkSession, d: String): DataFrame =
    kAnonymityCurve(Tables.events(s, d))

  /** RFM segmentation (r11): each user scored 1-5 on Recency (days since
    * last event vs the corpus anchor), Frequency (event count), and
    * Monetary (purchase micros), 5 = best — the classic customer-value
    * grid a lifecycle team reads before any churn/upsell targeting;
    * the per-user roll-up the retention cohort aggregates away.
    *
    * Determinism: scores are `ntile(5)` over TOTAL orders (each metric
    * tie-broken by user_id — ntile assigns by row position, so only a
    * total order is engine-portable, the q_rank_funcs rule); monetary
    * sums are exact micros.
    *
    * 100 TB shape: ONE user-keyed hash aggregation collapses the log to
    * the user grain (recency/frequency/monetary in one pass, conditional
    * sum for purchases — the q_ab_test trick); the 1-row anchor
    * broadcasts. The three ntile windows then sort the USER table, not
    * the log — the bounded-but-large demo form; at extreme user counts
    * the scores come from sketch-quantile cut points
    * (`Graft.approxQuantiles`) broadcast onto the same user scan. */
  private[graft] def rfmScores(events: DataFrame): DataFrame = {
    val anchor = events.agg(max(to_date(col("ts"))).as("_d1"))
    val users = events
      .groupBy(col("user_id"))
      .agg(max(to_date(col("ts"))).as("_last"),
        count(lit(1)).as("frequency"),
        sum(when(col("event_type") === "purchase",
          expr("cast(round(value * 1000000) AS bigint)")).otherwise(0L))
          .as("monetary_micro"))
      .crossJoin(broadcast(anchor))
      .withColumn("recency_days",
        datediff(col("_d1"), col("_last")).cast("bigint"))
    users
      .withColumn("r_score", ntile(5).over(
        Window.orderBy(col("recency_days").desc, col("user_id"))))
      .withColumn("f_score", ntile(5).over(
        Window.orderBy(col("frequency"), col("user_id"))))
      .withColumn("m_score", ntile(5).over(
        Window.orderBy(col("monetary_micro"), col("user_id"))))
      .select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary_micro"), col("r_score"), col("f_score"),
        col("m_score"),
        (col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
          .as("rfm_code"))
  }

  private def qRfm(s: SparkSession, d: String): DataFrame =
    rfmScores(Tables.events(s, d)).orderBy(col("user_id"))

  /** Benford first-digit audit (r11): the observed share of each leading
    * significant digit of the value measure against Benford's law — the
    * classic fabricated-data / fraud screen (organically-grown magnitudes
    * follow log-uniform leading digits; invented numbers don't). A large
    * deviation on a financial column is the cheapest red flag a data
    * audit can raise. The demo column is synthetic-uniform, so the
    * OUTPUT shows a strong deviation — which is the audit working.
    *
    * Exactness: the leading digit is the first character of the micro
    * long's decimal string — pure string algebra on an exact integer, no
    * float log in the digit extraction; shares are integer
    * micro-divisions; the Benford expectation is one shared
    * `log10(1 + 1/d)` text over the nine constant digits, rounded at the
    * edge. EXACT ZEROS are excluded before anything else (standard
    * Benford practice — zero has no leading significant digit, and an
    * unexcluded zero feeds `1/0` to the expectation: sf0.1 carries six
    * literal 0.0 values that proved it).
    *
    * 100 TB shape: map-side digit extraction, ONE ≤9-group hash agg, a
    * 1-row total broadcast. */
  private[graft] def benfordDigits(events: DataFrame): DataFrame = {
    val digits = events
      .select(expr("cast(round(value * 1000000) AS bigint)").as("_vm"))
      .filter(col("_vm") > 0)
      .select(expr("cast(substring(cast(_vm AS string), 1, 1) AS int)")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = digits.agg(sum(col("n")).as("_nt"))
    digits.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        expr("n * 1000000 div _nt").as("obs_micro"),
        expr("cast(round(log10(1.0 + 1.0 / digit) * 1000000) AS bigint)")
          .as("exp_micro"))
      .withColumn("dev_micro", col("obs_micro") - col("exp_micro"))
  }

  private def qBenford(s: SparkSession, d: String): DataFrame =
    benfordDigits(Tables.events(s, d)).orderBy(col("digit"))

  /** DAU/WAU/MAU + stickiness (r11): per calendar day, the exact distinct
    * users active that day, in the trailing 7 days, and in the trailing
    * 28 days, plus DAU/WAU stickiness — THE engagement panel every
    * product dashboard leads with.
    *
    * The scale trick: a trailing-window COUNT DISTINCT is not a window
    * function you can run at 100 TB (per-day state = the union of 28
    * days of user sets). Instead the log first collapses to distinct
    * (user, day) pairs — the only data-scaled shuffle — and each pair
    * then CONTRIBUTES itself to the ≤ 7 (resp. 28) trailing report days
    * it is visible in: a bounded map-side explode of id-pairs (the
    * q_retention_cohort shape), one distinct, one count. Day grid comes
    * from the observed span (1-row broadcast), so quiet days report 0;
    * contributions past the span fall out of the grid's left join.
    *
    * Stickiness is an integer micro-division with the shared zero guard
    * (a WAU of 0 only happens on an all-quiet week — NULL, not an
    * error, in both engines). */
  private[graft] def activeUsers(events: DataFrame): DataFrame = {
    val ud = events
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val grid = ud.agg(min(col("day")).as("_d0"), max(col("day")).as("_d1"))
      .selectExpr("explode(sequence(_d0, _d1, interval 1 day)) AS day")
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    def trailing(n: Int, name: String): DataFrame = ud
      .select(col("user_id"),
        explode(expr(s"sequence(day, date_add(day, ${n - 1}), interval 1 day)"))
          .as("day"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as(name))
    grid
      .join(dau, Seq("day"), "left")
      .join(trailing(7, "wau"), Seq("day"), "left")
      .join(trailing(28, "mau"), Seq("day"), "left")
      .select(col("day"),
        coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("wau"), lit(0L)).as("wau"),
        coalesce(col("mau"), lit(0L)).as("mau"))
      .withColumn("stickiness_micro",
        expr("CASE WHEN wau = 0 THEN NULL ELSE dau * 1000000 div wau END"))
  }

  private def qActiveUsers(s: SparkSession, d: String): DataFrame =
    activeUsers(Tables.events(s, d)).orderBy(col("day"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_histogram" -> qHistogram _,
    "q_path_topk" -> qPathTopk _,
    "q_k_anonymity" -> qKAnonymity _,
    "q_rfm" -> qRfm _,
    "q_benford" -> qBenford _,
    "q_active_users" -> qActiveUsers _,
    "q_ltv" -> qLtv _,
    "q_concentration" -> qConcentration _,
    "q_transitions" -> qTransitions _,
    "q_ab_test" -> qAbTest _,
    "q_attribution" -> qAttribution _,
    "q_corr" -> qCorr _,
    "q_moving_agg" -> qMovingAgg _,
    "q_profile" -> qProfile _,
    "q_rank_funcs" -> qRankFuncs _,
    "q_pivot" -> qPivot _,
    "q_percentiles" -> qPercentiles _,
    "q_scan_project" -> qScanProject _,
    "q_filter_seq" -> qFilterSeq _,
    "q_decode_types" -> qDecodeTypes _,
    "q_date_julian" -> qDateJulian _,
    "q_string_funcs" -> qStringFuncs _,
    "q_decimal_agg" -> qDecimalAgg _,
    "q_json_props" -> qJsonProps _,
    "q_lookup_join" -> qLookupJoin _,
    "q_multiway_join" -> qMultiwayJoin _,
    "q_topk_seq" -> qTopkSeq _,
    "q_set_ops" -> qSetOps _,
    "q_grouped_measures" -> qGroupedMeasures _,
    "q_rollup" -> qRollup _,
    "q_cube" -> qCube _,
    "q_funnel" -> qFunnel _,
    "q_retention_cohort" -> qRetentionCohort _
  )

  val oracle: Map[String, String] = Map(
    "q_concentration" ->
      """WITH u AS (
        |  SELECT user_id,
        |         cast(sum(CASE WHEN event_type = 'purchase'
        |                  THEN cast(round(value * 1000000) AS bigint)
        |                  ELSE 0 END) AS bigint) AS rev
        |  FROM events GROUP BY user_id),
        |r AS (
        |  SELECT rev,
        |         row_number() OVER (ORDER BY rev DESC, user_id) AS rn,
        |         cast(sum(rev) OVER (ORDER BY rev DESC, user_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bigint)
        |           AS cum
        |  FROM u),
        |t AS (SELECT count(*) AS n, cast(sum(rev) AS bigint) AS tot FROM u),
        |ks AS (SELECT unnest([1, 5, 10, 20]) AS pct)
        |SELECT cast(pct AS integer) AS pct,
        |       (n * pct + 99) // 100 AS top_n,
        |       cum * 1000000 // tot AS rev_share_micro
        |FROM ks, t JOIN r ON r.rn = (n * pct + 99) // 100
        |ORDER BY pct""".stripMargin,
    "q_ltv" ->
      """WITH fw AS (
        |  SELECT user_id, cast(min(date_trunc('week', ts)) AS date)
        |           AS cohort_week
        |  FROM events GROUP BY user_id),
        |sz AS (SELECT cohort_week, count(*) AS cohort_size FROM fw
        |       GROUP BY cohort_week),
        |uw AS (
        |  SELECT user_id, cast(date_trunc('week', ts) AS date) AS wk,
        |         sum(cast(round(value * 1000000) AS bigint)) AS rev
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |grid AS (
        |  SELECT f.cohort_week,
        |         cast(date_diff('day', f.cohort_week, u.wk) // 7 AS bigint)
        |           AS week_offset,
        |         count(*) AS n_buyers, cast(sum(rev) AS bigint) AS rev_micro
        |  FROM uw u JOIN fw f USING (user_id)
        |  GROUP BY 1, 2),
        |c AS (
        |  SELECT *, cast(sum(rev_micro) OVER (PARTITION BY cohort_week
        |           ORDER BY week_offset
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bigint)
        |           AS cum_rev_micro
        |  FROM grid)
        |SELECT c.cohort_week, week_offset, n_buyers, rev_micro,
        |       cum_rev_micro, cohort_size,
        |       cum_rev_micro // cohort_size AS ltv_micro
        |FROM c JOIN sz USING (cohort_week)
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "q_active_users" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, ts::DATE AS day FROM events),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM ud),
        |grid AS (
        |  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
        |  FROM b),
        |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
        |w7 AS (
        |  SELECT day, count(*) AS wau FROM (
        |    SELECT DISTINCT user_id,
        |           unnest(generate_series(day, day + 6, INTERVAL 1 DAY))::DATE AS day
        |    FROM ud) GROUP BY day),
        |w28 AS (
        |  SELECT day, count(*) AS mau FROM (
        |    SELECT DISTINCT user_id,
        |           unnest(generate_series(day, day + 27, INTERVAL 1 DAY))::DATE AS day
        |    FROM ud) GROUP BY day)
        |SELECT g.day, coalesce(dau, 0) AS dau, coalesce(wau, 0) AS wau,
        |       coalesce(mau, 0) AS mau,
        |       CASE WHEN coalesce(wau, 0) = 0 THEN NULL
        |            ELSE coalesce(dau, 0) * 1000000 // wau END
        |         AS stickiness_micro
        |FROM grid g
        |LEFT JOIN dau USING (day)
        |LEFT JOIN w7 USING (day)
        |LEFT JOIN w28 USING (day)
        |ORDER BY g.day""".stripMargin,
    "q_rfm" ->
      """WITH a AS (SELECT max(ts::DATE) AS d1 FROM events),
        |u AS (
        |  SELECT user_id, max(ts::DATE) AS last_day,
        |         cast(count(*) AS bigint) AS frequency,
        |         cast(sum(CASE WHEN event_type = 'purchase'
        |                  THEN cast(round(value * 1000000) AS bigint)
        |                  ELSE 0 END) AS bigint) AS monetary_micro
        |  FROM events GROUP BY user_id),
        |s AS (
        |  SELECT user_id, cast(date_diff('day', last_day, d1) AS bigint)
        |           AS recency_days,
        |         frequency, monetary_micro
        |  FROM u, a),
        |t AS (
        |  SELECT *,
        |         ntile(5) OVER (ORDER BY recency_days DESC, user_id) AS r_score,
        |         ntile(5) OVER (ORDER BY frequency, user_id) AS f_score,
        |         ntile(5) OVER (ORDER BY monetary_micro, user_id) AS m_score
        |  FROM s)
        |SELECT user_id, recency_days, frequency, monetary_micro,
        |       r_score, f_score, m_score,
        |       r_score * 100 + f_score * 10 + m_score AS rfm_code
        |FROM t ORDER BY user_id""".stripMargin,
    "q_benford" ->
      """WITH v AS (
        |  SELECT cast(round(value * 1000000) AS bigint) AS vm FROM events),
        |d AS (
        |  SELECT cast(substring(cast(vm AS varchar), 1, 1) AS integer)
        |           AS digit
        |  FROM v WHERE vm > 0),
        |g AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
        |t AS (SELECT cast(sum(n) AS bigint) AS nt FROM g)
        |SELECT digit, n,
        |       n * 1000000 // nt AS obs_micro,
        |       cast(round(log10(1.0 + 1.0 / digit) * 1000000) AS bigint)
        |         AS exp_micro,
        |       n * 1000000 // nt -
        |         cast(round(log10(1.0 + 1.0 / digit) * 1000000) AS bigint)
        |         AS dev_micro
        |FROM g, t ORDER BY digit""".stripMargin,
    "q_histogram" ->
      """WITH q AS (
        |  SELECT cast(round(value * 1000000) AS bigint) AS vm FROM events),
        |b AS (SELECT min(vm) AS v0, max(vm) AS v1 FROM q)
        |SELECT (vm - v0) * 20 // (v1 - v0 + 1) AS bin, count(*) AS n,
        |       min(vm) AS min_micro, max(vm) AS max_micro
        |FROM q, b GROUP BY 1 ORDER BY bin""".stripMargin,
    "q_path_topk" ->
      """WITH r AS (
        |  SELECT user_id, event_id, event_type,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY event_id) AS rn
        |  FROM events),
        |p AS (
        |  SELECT user_id,
        |         string_agg(event_type, '>' ORDER BY event_id) AS path
        |  FROM r WHERE rn <= 3 GROUP BY user_id)
        |SELECT path, count(*) AS n_users
        |FROM p GROUP BY path
        |ORDER BY n_users DESC, path LIMIT 10""".stripMargin,
    "q_k_anonymity" -> {
      val arms = AnonKs.map(k =>
        s"""SELECT $k AS k, n_classes, cb$k AS classes_below,
           |       rb$k AS rows_at_risk FROM s""".stripMargin)
        .mkString(" UNION ALL ")
      val sums = AnonKs.flatMap(k => Seq(
        s"cast(sum(CASE WHEN n < $k THEN 1 ELSE 0 END) AS bigint) AS cb$k",
        s"cast(sum(CASE WHEN n < $k THEN n ELSE 0 END) AS bigint) AS rb$k"))
        .mkString(", ")
      s"""WITH c AS (
         |  SELECT event_type, ts::DATE AS day,
         |         cast(round(value * 1000000) AS bigint) // 100000000 AS vb,
         |         count(*) AS n
         |  FROM events GROUP BY 1, 2, 3),
         |s AS (SELECT count(*) AS n_classes, $sums FROM c)
         |$arms
         |ORDER BY k""".stripMargin
    },
    "q_transitions" ->
      """WITH t AS (
        |  SELECT event_type,
        |         lead(event_type, 1) OVER (PARTITION BY user_id
        |                                   ORDER BY event_id) AS nxt
        |  FROM events),
        |m AS (SELECT event_type AS from_type, nxt AS to_type, count(*) AS n
        |      FROM t WHERE nxt IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |       n * 1000000
        |         // cast(sum(n) OVER (PARTITION BY from_type) AS bigint)
        |         AS p_micro
        |FROM m ORDER BY from_type, to_type""".stripMargin,
    "q_ab_test" -> {
      s"""WITH c AS (
         |  SELECT cast(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS bigint) AS n1,
         |         cast(sum(CASE WHEN user_id % 2 = 0 AND event_type = 'purchase' THEN 1 ELSE 0 END) AS bigint) AS x1,
         |         cast(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS bigint) AS n2,
         |         cast(sum(CASE WHEN user_id % 2 <> 0 AND event_type = 'purchase' THEN 1 ELSE 0 END) AS bigint) AS x2
         |  FROM events)
         |SELECT n1, x1, n2, x2, $abZFormula AS z,
         |       abs($abZFormula) >= 1.959964 AS significant_95
         |FROM c""".stripMargin
    },
    "q_attribution" ->
      """WITH t AS (
        |  SELECT event_id, user_id, event_type, value,
        |         last_value(CASE WHEN event_type = 'click' THEN event_id END
        |                    IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY event_id) AS last_click
        |  FROM events)
        |SELECT event_id AS purchase_id, user_id,
        |       CASE WHEN event_id - last_click <= 300 THEN last_click END AS click_id,
        |       CASE WHEN event_id - last_click <= 300 THEN event_id - last_click END AS gap,
        |       value AS amount
        |FROM t WHERE event_type = 'purchase'
        |ORDER BY purchase_id""".stripMargin,
    "q_corr" -> {
      val quant = CorrCols
        .map(c => s"cast(round($c * 1000000) AS bigint) AS ${c}_m")
        .mkString(", ")
      val sums = (CorrCols.flatMap(c => Seq(
        s"sum(cast(${c}_m AS hugeint)) AS s_$c",
        s"sum(cast(${c}_m AS hugeint) * ${c}_m) AS ss_$c")) ++
        CorrPairs.map { case (a, b) =>
          s"sum(cast(${a}_m AS hugeint) * ${b}_m) AS sp_${a}_$b"
        } :+ "count(*) AS n").mkString(", ")
      val arms = CorrPairs.map { case (a, b) =>
        s"SELECT '$a' AS x_col, '$b' AS y_col, cast(n AS bigint) AS n, " +
          corrFormula("n", s"s_$a", s"s_$b", s"ss_$a", s"ss_$b", s"sp_${a}_$b") +
          " AS corr FROM s"
      }.mkString(" UNION ALL ")
      s"""WITH m AS (SELECT $quant FROM lineitem),
         |s AS (SELECT $sums FROM m)
         |$arms
         |ORDER BY x_col, y_col""".stripMargin
    },
    // Profile: one UNION ALL arm per profiled column, generated from the
    // SAME ProfileCols spec as the Spark aggregation.
    "q_profile" -> {
      val arms = ProfileCols.map { case (n, _, e, isNum) =>
        val (mnn, mxn, mns, mxs) =
          if (isNum) (s"cast(min($e) AS double)", s"cast(max($e) AS double)",
            "cast(NULL AS varchar)", "cast(NULL AS varchar)")
          else ("cast(NULL AS double)", "cast(NULL AS double)",
            s"min($e)", s"max($e)")
        s"""SELECT '$n' AS col_name, count(*) AS n_rows,
           |       count(*) - count($e) AS n_null,
           |       count(DISTINCT $e) AS n_distinct,
           |       $mnn AS min_num, $mxn AS max_num,
           |       $mns AS min_str, $mxs AS max_str
           |FROM events""".stripMargin
      }
      arms.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },
    "q_rank_funcs" ->
      """SELECT event_type, event_id, value,
        |       cast(rank() OVER wv AS int) AS rnk,
        |       cast(dense_rank() OVER wv AS int) AS drnk,
        |       round(percent_rank() OVER wt, 6) AS prnk,
        |       round(cume_dist() OVER wt, 6) AS cdist,
        |       cast(ntile(4) OVER wt AS int) AS quartile
        |FROM events
        |WINDOW wv AS (PARTITION BY event_type ORDER BY value),
        |       wt AS (PARTITION BY event_type ORDER BY value, event_id)
        |ORDER BY event_type, value, event_id""".stripMargin,
    "q_moving_agg" ->
      """SELECT user_id, event_id, value,
        |       cast(sum(cast(value AS decimal(18,6))) OVER (
        |         PARTITION BY user_id ORDER BY event_id
        |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS double) AS mov_sum_3,
        |       cast(sum(cast(value AS decimal(18,6))) OVER (
        |         PARTITION BY user_id ORDER BY event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS double) AS run_sum
        |FROM events
        |ORDER BY user_id, event_id""".stripMargin,
    "q_pivot" ->
      """SELECT user_id,
        |       count(*) FILTER (event_type = 'click') AS click,
        |       count(*) FILTER (event_type = 'view') AS view,
        |       count(*) FILTER (event_type = 'purchase') AS purchase,
        |       count(*) FILTER (event_type = 'signup') AS signup,
        |       count(*) FILTER (event_type = 'error') AS error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_percentiles" ->
      """SELECT event_type, count(*) AS n,
        |       round(quantile_cont(value, 0.5), 6) AS p50,
        |       round(quantile_cont(value, 0.9), 6) AS p90,
        |       round(quantile_cont(value, 0.99), 6) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_scan_project" ->
      "SELECT event_id, user_id, event_type FROM events ORDER BY event_id",
    "q_filter_seq" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE event_id >= 500 AND event_type <> 'error'
        |ORDER BY event_id""".stripMargin,
    "q_decode_types" ->
      """SELECT l_orderkey,
        |       cast(l_linenumber AS smallint) AS v_smallint,
        |       cast(l_linenumber AS integer) AS v_int,
        |       cast(l_orderkey * 1000000 AS bigint) AS v_bigint,
        |       cast(cast(l_quantity AS decimal(32,16)) AS double) AS v_decimal,
        |       cast(l_extendedprice AS double) AS v_double,
        |       cast(cast(l_discount AS float) AS double) AS v_float_as_double,
        |       cast(l_shipdate AS date) AS v_date,
        |       cast(l_shipdate AS timestamp) AS v_timestamp,
        |       l_returnflag = 'R' AS v_bool
        |FROM lineitem WHERE l_orderkey < 1000
        |ORDER BY l_orderkey, v_smallint""".stripMargin,
    "q_date_julian" ->
      """SELECT event_id,
        |       DATE '1899-12-31' + cast(event_id % 40000 AS integer) AS v_date,
        |       cast(year(DATE '1899-12-31' + cast(event_id % 40000 AS integer)) AS integer) AS v_year,
        |       cast(month(DATE '1899-12-31' + cast(event_id % 40000 AS integer)) AS integer) AS v_month,
        |       cast(day(DATE '1899-12-31' + cast(event_id % 40000 AS integer)) AS integer) AS v_day
        |FROM events WHERE event_id < 2000
        |ORDER BY event_id""".stripMargin,
    "q_string_funcs" ->
      """SELECT c_custkey,
        |       upper(c_name) AS v_upper,
        |       lower(c_mktsegment) AS v_lower,
        |       cast(length(c_name) AS integer) AS v_len,
        |       substring(c_name, 1, 8) AS v_sub,
        |       concat(c_mktsegment, '-', c_name) AS v_concat,
        |       rtrim(concat(c_name, '   ')) AS v_rtrim,
        |       lpad(cast(c_custkey AS varchar), 10, '0') AS v_lpad
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_decimal_agg" ->
      """SELECT l_returnflag,
        |       cast(sum(cast(l_extendedprice AS decimal(18,2))) AS double) AS sum_price,
        |       cast(sum(cast(l_quantity AS decimal(18,2))) AS double) AS sum_qty,
        |       count(*) AS n_rows,
        |       cast(sum(cast(l_extendedprice AS decimal(18,2))) AS double) / count(*) AS avg_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_json_props" ->
      """SELECT cast(props->>'$.k' AS integer) AS k, count(*) AS n,
        |       min(event_id) AS first_seq
        |FROM events GROUP BY 1 ORDER BY k NULLS FIRST""".stripMargin,
    "q_lookup_join" ->
      """SELECT e.event_id, e.user_id, n.n_name
        |FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
        |ORDER BY e.event_id""".stripMargin,
    "q_multiway_join" ->
      """SELECT n_name, count(*) AS n_items,
        |       cast(sum(cast(l_extendedprice * (1.0 - l_discount) AS decimal(18,6))) AS double) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_topk_seq" ->
      """SELECT event_id, user_id, event_type FROM events
        |ORDER BY event_id DESC LIMIT 100""".stripMargin,
    "q_set_ops" ->
      """SELECT DISTINCT user_id FROM (
        |  (SELECT user_id FROM events WHERE event_type = 'click'
        |   INTERSECT
        |   SELECT user_id FROM events WHERE event_type = 'purchase')
        |  EXCEPT
        |  SELECT user_id FROM events WHERE event_type = 'error'
        |  UNION
        |  (SELECT user_id FROM events WHERE event_type = 'signup'
        |   INTERSECT
        |   SELECT user_id FROM events WHERE event_type = 'view')
        |) t ORDER BY user_id""".stripMargin,
    "q_grouped_measures" ->
      """SELECT l_returnflag, l_linestatus,
        |       cast(sum(cast(l_quantity AS decimal(18,2))) AS double) AS sum_qty,
        |       cast(sum(cast(l_extendedprice AS decimal(18,2))) AS double) AS sum_base_price,
        |       cast(sum(cast(l_extendedprice * (1.0 - l_discount) AS decimal(18,6))) AS double) AS sum_disc_price,
        |       cast(sum(cast(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS decimal(18,6))) AS double) AS sum_charge,
        |       count(*) AS count_order,
        |       cast(sum(cast(l_quantity AS decimal(18,2))) AS double) / count(*) AS avg_qty,
        |       cast(sum(cast(l_extendedprice AS decimal(18,2))) AS double) / count(*) AS avg_price
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_rollup" ->
      """SELECT event_type, cast(user_id % 5 AS integer) AS user_bucket,
        |       count(*) AS n,
        |       cast(sum(cast(value AS decimal(18,2))) AS double) AS sum_value
        |FROM events
        |GROUP BY ROLLUP (event_type, user_bucket)
        |ORDER BY event_type ASC NULLS FIRST, user_bucket ASC NULLS FIRST""".stripMargin,
    "q_cube" ->
      """SELECT event_type, cast(user_id % 5 AS integer) AS user_bucket,
        |       count(*) AS n,
        |       cast(sum(cast(value AS decimal(18,2))) AS double) AS sum_value
        |FROM events
        |GROUP BY CUBE (event_type, user_bucket)
        |ORDER BY event_type ASC NULLS FIRST, user_bucket ASC NULLS FIRST""".stripMargin,
    "q_funnel" ->
      """WITH u AS (
        |  SELECT user_id,
        |         list(struct_pack(event_id := event_id,
        |                          event_type := event_type)) AS evs
        |  FROM events GROUP BY user_id),
        |s AS (SELECT user_id,
        |  list_min(list_transform(list_filter(evs,
        |    e -> e.event_type = 'view'), e -> e.event_id)) AS v_id,
        |  list_min(list_transform(list_filter(evs,
        |    e -> e.event_type = 'click' AND e.event_id > v_id
        |         AND e.event_id <= v_id + 300), e -> e.event_id)) AS c_id,
        |  list_min(list_transform(list_filter(evs,
        |    e -> e.event_type = 'purchase' AND e.event_id > c_id
        |         AND e.event_id <= c_id + 300), e -> e.event_id)) AS p_id
        |  FROM u),
        |f AS (SELECT CASE WHEN p_id IS NOT NULL THEN 3
        |                  WHEN c_id IS NOT NULL THEN 2
        |                  WHEN v_id IS NOT NULL THEN 1 ELSE 0 END AS stage
        |      FROM s)
        |SELECT stage, count(*) AS n_users FROM f
        |GROUP BY stage ORDER BY stage""".stripMargin,
    // Same cohort arithmetic via an explicit first-seen ⋈ activity join
    // (DuckDB has no collect_set+explode idiom); both periods are
    // Monday-start date_trunc, offsets exact multiples of 7 days.
    "q_retention_cohort" ->
      """WITH fw AS (
        |  SELECT user_id, cast(min(date_trunc('week', ts)) AS date) AS cohort_week
        |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
        |aw AS (
        |  SELECT DISTINCT user_id, cast(date_trunc('week', ts) AS date) AS wk
        |  FROM events WHERE user_id IS NOT NULL),
        |grid AS (
        |  SELECT f.cohort_week,
        |         cast(date_diff('day', f.cohort_week, a.wk) / 7 AS int) AS week_offset,
        |         count(*) AS n_users
        |  FROM fw f JOIN aw a USING (user_id)
        |  GROUP BY 1, 2)
        |SELECT cohort_week, week_offset, n_users,
        |       max(CASE WHEN week_offset = 0 THEN n_users END)
        |         OVER (PARTITION BY cohort_week) AS cohort_size
        |FROM grid ORDER BY cohort_week, week_offset""".stripMargin
  )
}
