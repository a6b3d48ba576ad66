package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series and layout operators over the change-event log: gap-filled
  * resampling (the missing-bucket repair every metrics pipeline runs
  * before charting or model features), the Pareto-frontier skyline (the
  * multi-criteria "best tradeoff" query), and Z-order clustering (the
  * write-time layout that makes 100 TB scans skippable on TWO dimensions
  * at once).
  *
  * Reference behaviors these generalize: the reference materializes
  * per-key latest state from a timestamped change stream
  * (ext/_informixcdcmodule.ec:663-771 savepoint upserts) — gap-fill is
  * the same "carry state forward over quiet periods" semantic lifted to
  * the bucketed time axis.
  */
object SeriesOps {

  /** Gap-filled daily resample with last-observation-carried-forward —
    * the time-series staple between the raw event log and any
    * charting/feature pipeline: every (user, day) cell of each user's
    * active span gets a row, quiet days carry the last observed daily
    * total forward.
    *
    * Determinism: daily totals quantize each event's `value` to integer
    * MICROS before the sum (long addition is associative — the
    * q_rrf_fusion rule), so partitioning can't move a micro.
    *
    * 100 TB shape: ONE (user, day) hash aggregation collapses the event
    * log to the daily grain — the only shuffle that scales with the
    * data; everything after runs on the daily table, which is bounded by
    * users × calendar (not by events). The span aggregation and grid
    * explode shuffle (user, day) pairs only; the LOCF window partitions
    * by user (state = one user's days). No global sort anywhere. */
  private[graft] def gapFillDaily(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("user_id"), to_date(col("ts")).as("day"),
        expr("cast(round(value * 1000000) AS bigint)").as("_vm"))
      .groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("_n"), sum(col("_vm")).as("_day_micro"))
    val grid = daily
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("_d0"), max(col("day")).as("_d1"))
      .select(col("user_id"),
        explode(expr("sequence(_d0, _d1, interval 1 day)")).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("_n"), lit(0L)).as("n_events"),
        col("_n").isNotNull.as("observed"),
        last(col("_day_micro"), ignoreNulls = true).over(w)
          .as("filled_micro"))
  }

  private def qGapFill(s: SparkSession, d: String): DataFrame =
    gapFillDaily(Tables.events(s, d))
      .orderBy(col("user_id"), col("day"))

  /** Pareto-frontier skyline — minimize price, maximize size: the rows no
    * other row beats on both axes (strictly on at least one). The
    * multi-criteria shortlist query (cheapest-per-capability) that a
    * naive engine runs as an all-pairs NOT EXISTS.
    *
    * 100 TB shape: all-pairs dominance is quadratic, so the big scan only
    * feeds a BUCKET PREFILTER — per price-bucket max size (a tiny hash
    * agg), running max over strictly-cheaper buckets (a window over ≤
    * #buckets rows), broadcast back onto the scan. Any row whose size ≤
    * that running max is dominated by a strictly-cheaper row and drops
    * map-side; survivors are the frontier plus boundary noise — O(sky),
    * not O(N). The EXACT phase (per-price group max + running max over
    * distinct prices) then runs on that small candidate set, where its
    * single-partition window is bounded by the candidate count, not the
    * table. Dominance is transitive, so every dominated candidate has a
    * dominating SKYLINE row — and skyline rows are never prefiltered —
    * which makes the two-phase answer exact. */
  private[graft] def skyline(points: DataFrame, idCol: String,
      priceCol: String, sizeCol: String): DataFrame = {
    val pts = points.select(col(idCol), col(priceCol).as("_price"),
      col(sizeCol).as("_size"))
    // Prefilter: bucket by floor(price) div 10; a row in a strictly
    // smaller bucket has a strictly smaller price, so bucketPrevMax
    // dominating-size is a sound (never false-dropping) dominance proof.
    val wb = Window.orderBy(col("_pb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bstat = pts
      .groupBy(expr("cast(floor(_price) AS bigint) div 10").as("_pb"))
      .agg(max(col("_size")).as("_bmax"))
      .select(col("_pb"), max(col("_bmax")).over(wb).as("_prevmax"))
    // Materialized: the exact phase references the candidate set from two
    // plan branches (frontier derivation + final join) — without this the
    // prefilter re-scans the base table per branch.
    val cand = Materialize(pts
      .withColumn("_pb", expr("cast(floor(_price) AS bigint) div 10"))
      .join(broadcast(bstat), Seq("_pb"))
      .filter(col("_prevmax").isNull || col("_size") > col("_prevmax")))
    // Exact phase on the small candidate set: a price group survives iff
    // its max size strictly beats every strictly-cheaper candidate; rows
    // below their group max are dominated at equal price.
    val frontier = cand
      .groupBy(col("_price").as("_fprice")).agg(max(col("_size")).as("_mg"))
      .withColumn("_prev",
        max(col("_mg")).over(Window.orderBy(col("_fprice"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .filter(col("_prev").isNull || col("_mg") > col("_prev"))
    cand.join(broadcast(frontier),
        col("_price") === col("_fprice") && col("_size") === col("_mg"))
      .select(col(idCol), col("_price").as(priceCol),
        col("_size").as(sizeCol))
  }

  private def qSkyline(s: SparkSession, d: String): DataFrame =
    skyline(Tables.part(s, d), "p_partkey", "p_retailprice", "p_size")
      .orderBy(col("p_partkey"))

  /** Morton/Z-order bit-interleave of two 8-bit bucket columns — emitted
    * as an expression-string builder so the Spark plan and the DuckDB
    * oracle run the SAME integer arithmetic (`div`/`%` on non-negative
    * longs; DuckDB spells div `//`). */
  private[graft] def zExpr(bx: String, by: String, div: String): String =
    (0 until 8).map { i =>
      val p = 1L << i
      s"(($bx $div $p) % 2) * ${1L << (2 * i + 1)} + " +
        s"(($by $div $p) % 2) * ${1L << (2 * i)}"
    }.mkString(" + ")

  /** Z-order layout audit — the write-time clustering that makes a
    * 100 TB table skippable on two dimensions at once: bucket user_id
    * and value to 8 bits each (integer arithmetic over micro-quantized
    * values — no float in the key), interleave the bits into a 16-bit
    * Morton code, split the code range into 32 shards, and report each
    * shard's row count and min/max bounds on BOTH raw dimensions.
    *
    * Tight per-shard bounds on both axes are exactly what file-level
    * min/max statistics prune on: a predicate on EITHER dimension skips
    * most shards, which a single-column sort only achieves for its own
    * leading column. The audit output IS the skipping story.
    *
    * 100 TB shape: one tiny bounds aggregation (1 row, broadcast onto
    * the scan), the Morton code map-side, then ONE 32-group hash
    * aggregation. Nothing sorts globally: the shard id is a bit prefix
    * of the code, so the "layout" needs no range exchange to audit (and
    * at write time would be a plain repartition on the code prefix). */
  private[graft] def zorderShards(events: DataFrame): DataFrame = {
    val q = events.select(col("user_id"),
      expr("cast(round(value * 1000000) AS bigint)").as("_vm"),
      col("value"))
    val bounds = q.agg(min(col("user_id")).as("_u0"),
      max(col("user_id")).as("_u1"), min(col("_vm")).as("_v0"),
      max(col("_vm")).as("_v1"))
    val bx = "((user_id - _u0) * 256 div (_u1 - _u0 + 1))"
    val by = "((_vm - _v0) * 256 div (_v1 - _v0 + 1))"
    q.crossJoin(broadcast(bounds))
      .withColumn("_z", expr(zExpr(bx, by, "div")))
      .groupBy(expr("_z div 2048").as("shard"))
      .agg(count(lit(1)).as("n"),
        min(col("user_id")).as("min_user"), max(col("user_id")).as("max_user"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"))
  }

  private def qZorder(s: SparkSession, d: String): DataFrame =
    zorderShards(Tables.events(s, d)).orderBy(col("shard"))

  /** Moving-average trend/residual decomposition (r11): each event
    * type's daily total split into a 7-day centered moving-average trend
    * and its residual — the detrending step between the raw series and
    * any seasonality/anomaly analysis (a spike reads as a LARGE RESIDUAL
    * once the slow trend is removed; comparing raw values across a
    * drifting baseline reads noise).
    *
    * Entirely integer-exact: daily totals are micro-quantized long sums
    * (the gap-fill rule), the trend is `window-sum div window-count`
    * (integer division over a ROWS frame), and the residual is a long
    * subtraction — no double anywhere, so engines cannot drift.
    *
    * 100 TB shape: ONE (type, day) hash aggregation collapses the log to
    * the daily grain; the centered window runs per type over the bounded
    * daily table (ROWS frames over days, never events). The frame is the
    * OBSERVED day grid — compose with [[gapFillDaily]] first when the
    * calendar has holes and strict 7-calendar-day windows are needed. */
  private[graft] def detrendDaily(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"), to_date(col("ts")).as("day"),
        expr("cast(round(value * 1000000) AS bigint)").as("_vm"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("_vm")).as("day_micro"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    daily
      .withColumn("_sw", sum(col("day_micro")).over(w))
      .withColumn("_cw", count(lit(1)).over(w))
      // integer div, not `/`+cast: `/` is double division (inexact past
      // 2^53 micros). Spark `div` truncates while DuckDB `//` floors —
      // equal only on non-negative sums, which `value >= 0` guarantees
      // here; a signed-value deployment must offset before dividing.
      .withColumn("trend_micro", expr("_sw div _cw"))
      .withColumn("resid_micro", col("day_micro") - col("trend_micro"))
      .drop("_sw", "_cw")
  }

  private def qDetrend(s: SparkSession, d: String): DataFrame =
    detrendDaily(Tables.events(s, d))
      .orderBy(col("event_type"), col("day"))

  /** Daily anomaly flags (r11): each (type, day) flagged when its
    * detrended residual deviates from the type's residual median by more
    * than 3 robust units (3 × MAD) — the alerting composition the series
    * family builds to ([[detrendDaily]] removes the baseline so a spike
    * is a LARGE RESIDUAL; the MAD gate makes the threshold immune to the
    * spikes it is hunting, the `q_mad_outliers` argument, here applied
    * to the residual series instead of raw values).
    *
    * Exactness: residuals are exact long micros; the median and MAD are
    * exact binary doubles (integer inputs ⇒ interpolation factor 0 or
    * exactly 0.5 — the rolling-median argument), so the subtraction and
    * the `> 3·MAD` comparison are IEEE-exact in both engines; no
    * rounding is needed anywhere. MAD = 0 (an over-regular series)
    * flags exactly the rows with any deviation — the natural limit.
    *
    * 100 TB shape: the detrend's one daily hash agg is the only
    * data-scaled shuffle; medians aggregate the bounded daily table per
    * type and broadcast back as 1-row-per-type frames. */
  private[graft] def anomalyDays(events: DataFrame): DataFrame = {
    val daily = detrendDaily(events)
    val med = daily.groupBy(col("event_type"))
      .agg(expr("percentile(resid_micro, 0.5)").as("_med"))
    val dev = daily.join(broadcast(med), Seq("event_type"))
    val mad = dev.groupBy(col("event_type"))
      .agg(expr("percentile(abs(resid_micro - _med), 0.5)").as("_mad"))
    dev.join(broadcast(mad), Seq("event_type"))
      .withColumn("is_anomaly",
        expr("abs(resid_micro - _med) > 3 * _mad"))
      .select(col("event_type"), col("day"), col("day_micro"),
        col("trend_micro"), col("resid_micro"), col("is_anomaly"))
  }

  private def qAnomaly(s: SparkSession, d: String): DataFrame =
    anomalyDays(Tables.events(s, d))
      .orderBy(col("event_type"), col("day"))

  /** Distributed scaffold for per-event TRAILING windows (r13): rows of
    * the event log tagged with a bounded-size bucket key such that a
    * `ROWS BETWEEN (tail) PRECEDING AND CURRENT ROW` window over
    * `(event_type, _bkt)` ordered by `_rn` is EXACTLY the global
    * per-type trailing window — without ever sorting a whole type in
    * one task (the r12 verdict's scale-killer: a handful of types means
    * a handful of tasks, however large the log).
    *
    * Three bounded passes:
    *  1. chunk rows by id range (`event_id div 65536` — ≤ 65536 rows per
    *     (type, chunk)) and count each chunk;
    *  2. exclusive prefix-sum the per-chunk counts with a per-type
    *     window over the CHUNK SUMMARY (65536× smaller than the data;
    *     were even that too large, the same scaffold applies to the
    *     summary recursively) — joining the offsets back gives every
    *     row its exact per-type row number `_rn` from a window over
    *     bounded (type, chunk) partitions only;
    *  3. bucket by row number (`(_rn−1) div bucketRows` — buckets are
    *     CONTIGUOUS in `_rn` by construction, so unlike id-range buckets
    *     they stay adjacent under arbitrarily sparse types), and
    *     replicate each bucket's last `tail` rows into the NEXT bucket
    *     as non-home context.
    *
    * Every home row then sees its full `tail` predecessors inside its
    * own partition (context + in-bucket rows), partitions are ≤
    * bucketRows + tail rows, and the global ramp-up rows (fewer than
    * `tail` predecessors exist) ramp up exactly as the single-exchange
    * window would — equality is suite-pinned (SeriesBucketedSuite).
    * Callers window over [[trailingWindow]] and drop `_home = false`. */
  private[graft] def bucketedTrailingFrame(events: DataFrame, tail: Int,
      bucketRows: Long = 8192L): DataFrame = {
    require(bucketRows > tail, s"bucketRows $bucketRows must exceed tail $tail")
    val t = events.select(col("event_type"), col("event_id"), col("value"),
        expr("cast(round(value * 1000000) AS bigint)").as("_vm"))
      .withColumn("_ck", expr("event_id div 65536"))
    val cnt = t.groupBy(col("event_type"), col("_ck"))
      .agg(count(lit(1)).as("_c"))
    val off = cnt.withColumn("_off",
      coalesce(sum(col("_c")).over(
        Window.partitionBy(col("event_type")).orderBy(col("_ck"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val rn = t
      .join(off.select(col("event_type"), col("_ck"), col("_off")),
        Seq("event_type", "_ck"))
      .withColumn("_rn", col("_off") + row_number().over(
        Window.partitionBy(col("event_type"), col("_ck"))
          .orderBy(col("event_id"))).cast("long"))
      .drop("_ck", "_off")
    val home = rn.withColumn("_bkt", expr(s"(_rn - 1) div $bucketRows"))
      .withColumn("_home", lit(true))
    val carry = home
      .filter(expr(s"(_rn - 1) % $bucketRows >= $bucketRows - $tail"))
      .withColumn("_bkt", col("_bkt") + 1)
      .withColumn("_home", lit(false))
    home.unionByName(carry)
  }

  /** The trailing frame over a [[bucketedTrailingFrame]]: identical
    * contents to the global per-type `ROWS (tail) PRECEDING` window for
    * every `_home` row. */
  private def trailingWindow(tail: Int) =
    Window.partitionBy(col("event_type"), col("_bkt"))
      .orderBy(col("_rn")).rowsBetween(-tail, 0)

  /** Rolling MEDIAN smoother (r11): each event's 50-row trailing median
    * per type — the robust line a latency/metric dashboard draws (a
    * rolling MEAN chases every spike; the rolling median rides through
    * them — the windowed form of the `q_mad_outliers` robustness
    * argument).
    *
    * Why median and not an arbitrary rolling quantile: over integer
    * micro inputs the median's interpolation factor is ALWAYS 0 or
    * exactly 0.5 (position `0.5·(n−1)` for any window length n), and
    * integer midpoints are exact in IEEE — so the rolling median is
    * engine-exact at every row including the ramp-up partial windows,
    * where a p95's factor (`0.95·(n−1)` fractional part) is inexact and
    * its last-ulp evaluation-order differences could flip a 6-dp hash
    * across 10⁵ output rows. A production p95 wants the sketch form
    * (`Graft.approxQuantiles`) anyway.
    *
    * 100 TB shape (r13): the [[bucketedTrailingFrame]] scaffold — no
    * single task ever sorts a whole type; the window runs over ≤
    * bucketRows + 49 rows per partition with the 49-row boundary tail
    * carried between buckets. */
  private[graft] def rollingMedian(events: DataFrame,
      bucketRows: Long = 8192L): DataFrame =
    bucketedTrailingFrame(events, 49, bucketRows)
      .withColumn("med_micro", expr("percentile(_vm, 0.5)").over(
        trailingWindow(49)))
      .filter(col("_home"))
      .select(col("event_type"), col("event_id"), col("value"),
        col("med_micro"))

  private def qRollingMedian(s: SparkSession, d: String): DataFrame =
    rollingMedian(Tables.events(s, d))
      .orderBy(col("event_type"), col("event_id"))

  /** Exponentially weighted moving average (r11): each event's trailing
    * EWMA per type with decay α = 1/2 over a 30-row horizon — the smoother
    * a live metrics view runs when recent points should dominate (the
    * rolling mean weighs a 50-row-old spike as much as the last point;
    * EWMA halves a point's influence every step).
    *
    * Exact by construction: α = 1/2 makes every weight a power of two, so
    * the weighted sum is `Σ xᵢ·2^i` over the frame (oldest first, newest
    * weight 2^(n−1)) — a LONG shift-and-add fold — and the normalizer is
    * the closed-form `2^n − 1`; one integer division at the end, no double
    * anywhere. The 30-row truncation drops weight 2⁻³⁰ ≈ 1e-9 of the
    * signal — below the 1-micro output grain. Overflow headroom: max
    * |x| ≈ 5e8 micros · 2³⁰ ≈ 5.4e17 < 2⁶³. An arbitrary-α EWMA is a
    * geometric double recursion — order-sensitive and engine-unportable;
    * the power-of-two decay is the hash-stable form.
    *
    * 100 TB shape (r13): the [[bucketedTrailingFrame]] scaffold — the
    * frame keeps 30 longs of state per row over ≤ bucketRows + 29 row
    * partitions, the 29-row boundary tail carried between buckets; the
    * fold is map-side list algebra over the frame (no per-type global
    * sort task anywhere). */
  private[graft] def ewmaTrailing(events: DataFrame,
      bucketRows: Long = 8192L): DataFrame =
    bucketedTrailingFrame(events, 29, bucketRows)
      .withColumn("_l", collect_list(col("_vm")).over(trailingWindow(29)))
      .withColumn("ewma_micro", expr(
        """aggregate(
          |  zip_with(_l, sequence(0, size(_l) - 1),
          |           (x, i) -> x * shiftleft(cast(1 AS bigint), i)),
          |  cast(0 AS bigint), (a, x) -> a + x)
          |div (shiftleft(cast(1 AS bigint), size(_l)) - 1)""".stripMargin))
      .filter(col("_home"))
      .select(col("event_type"), col("event_id"), col("ewma_micro"))

  private def qEwma(s: SparkSession, d: String): DataFrame =
    ewmaTrailing(Tables.events(s, d))
      .orderBy(col("event_type"), col("event_id"))

  /** The lag grid [[qAutocorr]] reports. */
  private val AcfLags: Seq[Int] = 1 to 7

  /** Lag-k autocorrelation of the daily series (r11): per event type, the
    * Pearson correlation of (dayₜ, dayₜ₋ₖ) for k = 1..7 — the ACF panel
    * that answers "is there a weekly cycle?" before any seasonality model,
    * completing the series toolkit (detrend isolates the residual; the ACF
    * says whether the residual still carries structure).
    *
    * Determinism: the q_corr discipline verbatim — daily totals are
    * micro-quantized long sums, all moment sums (Σx, Σy, Σx², Σy², Σxy)
    * carry in decimal(38,0) (products of two ~1e13-micro day totals are
    * ~1e26 — past long, inside decimal 38), and the r formula is the
    * SHARED [[RelationalQueries.corrFormula]] text evaluated over the
    * exact sums in both engines, rounded at the edge.
    *
    * 100 TB shape: ONE (type, day) hash aggregation collapses the log to
    * the daily grain; all 7 lag columns stack on ONE window exchange per
    * type; the unpivot explodes map-side and the moment aggregation is
    * bounded by types × 7 groups. Nothing after the daily agg scales with
    * events. */
  private[graft] def autocorrDaily(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"), to_date(col("ts")).as("day"),
        expr("cast(round(value * 1000000) AS bigint)").as("_vm"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("_vm")).as("_y"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val lagged = AcfLags.foldLeft(daily) { (df, k) =>
      df.withColumn(s"_l$k", lag(col("_y"), k).over(w))
    }
    val arms = AcfLags
      .map(k => s"struct($k AS lag, _y AS y, _l$k AS yl)").mkString(", ")
    lagged
      .selectExpr("event_type", s"explode(array($arms)) AS p")
      .filter(col("p.yl").isNotNull)
      .groupBy(col("event_type"), col("p.lag").as("lag"))
      .agg(
        count(lit(1)).as("n"),
        sum(expr("cast(p.y AS decimal(38,0))")).as("_sx"),
        sum(expr("cast(p.yl AS decimal(38,0))")).as("_sy"),
        sum(expr("cast(p.y AS decimal(38,0)) * p.y")).as("_sxx"),
        sum(expr("cast(p.yl AS decimal(38,0)) * p.yl")).as("_syy"),
        sum(expr("cast(p.y AS decimal(38,0)) * p.yl")).as("_sxy"))
      .withColumn("acf", expr(RelationalQueries.corrFormula(
        "n", "_sx", "_sy", "_sxx", "_syy", "_sxy")))
      .select(col("event_type"), col("lag"), col("n"), col("acf"))
  }

  private def qAutocorr(s: SparkSession, d: String): DataFrame =
    autocorrDaily(Tables.events(s, d))
      .orderBy(col("event_type"), col("lag"))

  /** Forecast-skill backtest (r11): the two zero-parameter baselines every
    * forecasting effort must beat — naive (yesterday's value) and
    * seasonal-naive (the value one week ago) — backtested over the daily
    * series per type, reported as MAE plus their ratio ("skill": < 1e6
    * micro means weekly seasonality is real signal). This is the go/no-go
    * read BEFORE buying a model: if seasonal-naive doesn't beat naive,
    * there is no weekly cycle worth modeling (and [[autocorrDaily]] says
    * the same thing from the correlation side).
    *
    * Exactness: forecasts are lagged micro longs, errors are long
    * |subtractions| summed associatively, MAEs and the skill ratio are
    * integer micro-divisions; a zero naive-MAE (constant series) yields
    * NULL skill by the same guard in both engines.
    *
    * 100 TB shape: ONE daily hash aggregation collapses the log; both
    * lags ride one window exchange per type; the final agg is bounded by
    * |types|. */
  private[graft] def backtestDaily(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"), to_date(col("ts")).as("day"),
        expr("cast(round(value * 1000000) AS bigint)").as("_vm"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("_vm")).as("_y"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    daily
      .withColumn("_p1", lag(col("_y"), 1).over(w))
      .withColumn("_p7", lag(col("_y"), 7).over(w))
      .filter(col("_p1").isNotNull && col("_p7").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("_y") - col("_p1"))).as("_e1"),
        sum(abs(col("_y") - col("_p7"))).as("_e7"))
      .select(col("event_type"), col("n_days"),
        expr("_e1 div n_days").as("mae_naive_micro"),
        expr("_e7 div n_days").as("mae_seasonal_micro"),
        expr("CASE WHEN _e1 = 0 THEN NULL ELSE _e7 * 1000000 div _e1 END")
          .as("skill_micro"))
  }

  private def qBacktest(s: SparkSession, d: String): DataFrame =
    backtestDaily(Tables.events(s, d)).orderBy(col("event_type"))

  /** Seasonal-naive 7-day forecast with empirical error bands (r12): per
    * type, the next week's daily totals forecast as "same weekday last
    * week" — the zero-parameter baseline [[backtestDaily]] scores —
    * with lo/hi bands from the rank-ceil p10/p90 of the HISTORICAL
    * signed 7-lag errors (the same errors the backtest sums). The
    * product end of the series family: profile says the shape, backtest
    * says the skill, this emits the numbers a capacity plan loads.
    *
    * Exactness: points are observed micro longs; bands add the exact
    * error VALUES at ranks ⌈0.1n⌉/⌈0.9n⌉ (the q_winsorize rank-ceil —
    * no interpolation, well-defined under ties); horizons with no
    * observation one week back (sparse tail) are absent in both engines
    * (inner join on the source day).
    *
    * 100 TB shape: ONE daily hash aggregation; the lag window, per-type
    * error ranks, and the 7-row-per-type forecast join all run on the
    * bounded daily table; per-type anchors broadcast. */
  private[graft] def forecastDaily(events: DataFrame): DataFrame = {
    val daily = Materialize(events
      .select(col("event_type"), to_date(col("ts")).as("day"),
        expr("cast(round(value * 1000000) AS bigint)").as("_vm"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("_vm")).as("_y")))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val errs = daily
      .withColumn("_p7", lag(col("_y"), 7).over(w))
      .filter(col("_p7").isNotNull)
      .select(col("event_type"), (col("_y") - col("_p7")).as("_e"))
    val tot = errs.groupBy(col("event_type")).agg(count(lit(1)).as("_n"))
      .select(col("event_type"),
        expr("(10 * _n + 99) div 100").as("_lo_r"),
        expr("(90 * _n + 99) div 100").as("_hi_r"))
    val band = errs
      .withColumn("_r", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("_e"))).cast("long"))
      .join(broadcast(tot), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(min(when(col("_r") === col("_lo_r"), col("_e"))).as("_elo"),
        max(when(col("_r") === col("_hi_r"), col("_e"))).as("_ehi"))
    val anchor = daily.groupBy(col("event_type")).agg(max(col("day")).as("_d1"))
    daily.join(broadcast(anchor), Seq("event_type"))
      .filter(col("day") > date_add(col("_d1"), -7))
      .join(broadcast(band), Seq("event_type"))
      .select(col("event_type"),
        date_add(col("day"), 7).as("day"),
        (datediff(date_add(col("day"), 7), col("_d1"))).cast("long")
          .as("horizon"),
        col("_y").as("point_micro"),
        (col("_y") + col("_elo")).as("lo_micro"),
        (col("_y") + col("_ehi")).as("hi_micro"))
  }

  private def qForecast(s: SparkSession, d: String): DataFrame =
    forecastDaily(Tables.events(s, d))
      .orderBy(col("event_type"), col("day"))

  /** Weekday seasonality profile (r11): per event type, each weekday's
    * average daily total and its micro-ratio to the type's overall daily
    * average — the seasonality FINGERPRINT behind the ACF's yes/no (the
    * ACF says "a weekly cycle exists"; this says WHICH days carry it,
    * the shape a capacity planner or anomaly baseline actually loads).
    *
    * Exactness: daily totals are micro-quantized long sums; both
    * averages are integer micro-divisions; the ratio divides the two
    * exact averages in integer micro-units. Weekday numbering is pinned
    * to ISO (1 = Monday): Spark spells it `weekday() + 1`, DuckDB
    * `isodow` — same integers, no locale dependence (Spark's
    * `dayofweek`/DuckDB's `dow` both start Sunday but disagree with the
    * ISO convention analysts read).
    *
    * 100 TB shape: ONE (type, day) hash aggregation collapses the log;
    * the weekday roll-up and the per-type totals are two aggregations
    * over the bounded daily table; the 1-row-per-type overall average
    * joins back on the type key. */
  private[graft] def weekdayProfile(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"), to_date(col("ts")).as("day"),
        expr("cast(round(value * 1000000) AS bigint)").as("_vm"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("_vm")).as("_y"))
    val byDow = daily
      .groupBy(col("event_type"),
        expr("weekday(day) + 1").cast("int").as("dow"))
      .agg(count(lit(1)).as("n_days"),
        expr("sum(_y) div count(1)").as("avg_micro"))
    val overall = daily.groupBy(col("event_type"))
      .agg(expr("sum(_y) div count(1)").as("_base"))
    byDow.join(overall, Seq("event_type"))
      .select(col("event_type"), col("dow"), col("n_days"),
        col("avg_micro"),
        expr("avg_micro * 1000000 div _base").as("ratio_micro"))
  }

  private def qWeekdayProfile(s: SparkSession, d: String): DataFrame =
    weekdayProfile(Tables.events(s, d))
      .orderBy(col("event_type"), col("dow"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_weekday_profile" -> qWeekdayProfile _,
    "q_backtest" -> qBacktest _,
    "q_forecast" -> qForecast _,
    "q_ewma" -> qEwma _,
    "q_autocorr" -> qAutocorr _,
    "q_rolling_median" -> qRollingMedian _,
    "q_detrend" -> qDetrend _,
    "q_anomaly" -> qAnomaly _,
    "q_gap_fill" -> qGapFill _,
    "q_skyline" -> qSkyline _,
    "q_zorder" -> qZorder _)

  /** The detrend oracle's shared CTE chain (no leading WITH), ending in
    * `det(event_type, day, day_micro, trend_micro, resid_micro)` — one
    * string for `q_detrend` and the `q_anomaly` composition built on it.
    * A def, not a val: the oracle map interpolates it during object
    * init (the FuzzyJoin lesson). Every `sum`/`//`-derived integer that
    * reaches an output column is cast back to BIGINT: DuckDB widens
    * integer sums to HUGEINT, which pandas renders as float64 — equal in
    * value to Spark's long but a different TYPE, so the driver's hash
    * (type-sensitive) fails while a pure value compare passes. */
  private def detrendCte: String =
    """daily AS (
      |  SELECT event_type, ts::DATE AS day,
      |         cast(sum(cast(round(value * 1000000) AS bigint)) AS bigint)
      |           AS day_micro
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT event_type, day, day_micro,
      |         sum(day_micro) OVER (PARTITION BY event_type ORDER BY day
      |                              ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS sw,
      |         count(*) OVER (PARTITION BY event_type ORDER BY day
      |                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS cw
      |  FROM daily),
      |det AS (
      |  SELECT event_type, day, day_micro,
      |         cast(sw // cw AS bigint) AS trend_micro,
      |         day_micro - cast(sw // cw AS bigint) AS resid_micro
      |  FROM w)""".stripMargin

  /** The autocorrelation oracle's per-lag arm, generated from the same
    * [[AcfLags]] grid so the two engines can't disagree on the panel. */
  private def acfOracleArm(k: Int): String =
    s"""SELECT event_type, $k AS lag, y, lag(y, $k) OVER (
       |  PARTITION BY event_type ORDER BY day) AS yl
       |FROM daily""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_weekday_profile" ->
      """WITH daily AS (
        |  SELECT event_type, ts::DATE AS day,
        |         sum(cast(round(value * 1000000) AS bigint)) AS y
        |  FROM events GROUP BY 1, 2),
        |dw AS (
        |  SELECT event_type, cast(isodow(day) AS integer) AS dow,
        |         count(*) AS n_days,
        |         cast(sum(y) // count(*) AS bigint) AS avg_micro
        |  FROM daily GROUP BY 1, 2),
        |base AS (
        |  SELECT event_type, cast(sum(y) // count(*) AS bigint) AS b
        |  FROM daily GROUP BY 1)
        |SELECT event_type, dow, n_days, avg_micro,
        |       avg_micro * 1000000 // b AS ratio_micro
        |FROM dw JOIN base USING (event_type)
        |ORDER BY event_type, dow""".stripMargin,
    "q_backtest" ->
      """WITH daily AS (
        |  SELECT event_type, ts::DATE AS day,
        |         sum(cast(round(value * 1000000) AS bigint)) AS y
        |  FROM events GROUP BY 1, 2),
        |l AS (
        |  SELECT event_type, y,
        |         lag(y, 1) OVER (PARTITION BY event_type ORDER BY day) AS p1,
        |         lag(y, 7) OVER (PARTITION BY event_type ORDER BY day) AS p7
        |  FROM daily),
        |m AS (
        |  SELECT event_type, count(*) AS n_days,
        |         cast(sum(abs(y - p1)) AS bigint) AS e1,
        |         cast(sum(abs(y - p7)) AS bigint) AS e7
        |  FROM l WHERE p1 IS NOT NULL AND p7 IS NOT NULL GROUP BY 1)
        |SELECT event_type, n_days,
        |       e1 // n_days AS mae_naive_micro,
        |       e7 // n_days AS mae_seasonal_micro,
        |       CASE WHEN e1 = 0 THEN NULL
        |            ELSE e7 * 1000000 // e1 END AS skill_micro
        |FROM m ORDER BY event_type""".stripMargin,
    "q_ewma" ->
      """WITH t AS (
        |  SELECT event_type, event_id,
        |         cast(round(value * 1000000) AS bigint) AS vm
        |  FROM events),
        |w AS (
        |  SELECT event_type, event_id,
        |         list(vm) OVER (PARTITION BY event_type ORDER BY event_id
        |                        ROWS BETWEEN 29 PRECEDING AND CURRENT ROW) AS l
        |  FROM t)
        |SELECT event_type, event_id,
        |       cast(list_sum(list_transform(l,
        |              (x, i) -> x * (cast(1 AS bigint) << (i - 1)))) AS bigint)
        |         // ((cast(1 AS bigint) << len(l)) - 1) AS ewma_micro
        |FROM w ORDER BY event_type, event_id""".stripMargin,
    "q_autocorr" -> {
      val arms = AcfLags.map(acfOracleArm).mkString(" UNION ALL ")
      s"""WITH daily AS (
         |  SELECT event_type, ts::DATE AS day,
         |         sum(cast(round(value * 1000000) AS bigint)) AS y
         |  FROM events GROUP BY 1, 2),
         |pairs AS ($arms),
         |m AS (
         |  SELECT event_type, lag, count(*) AS n,
         |         sum(cast(y AS hugeint)) AS sx,
         |         sum(cast(yl AS hugeint)) AS sy,
         |         sum(cast(y AS hugeint) * y) AS sxx,
         |         sum(cast(yl AS hugeint) * yl) AS syy,
         |         sum(cast(y AS hugeint) * yl) AS sxy
         |  FROM pairs WHERE yl IS NOT NULL GROUP BY 1, 2)
         |SELECT event_type, lag, n,
         |       ${RelationalQueries.corrFormula("n", "sx", "sy", "sxx", "syy", "sxy")} AS acf
         |FROM m ORDER BY event_type, lag""".stripMargin
    },
    "q_forecast" ->
      """WITH daily AS (
        |  SELECT event_type, ts::DATE AS day,
        |         cast(sum(cast(round(value * 1000000) AS bigint)) AS bigint)
        |           AS y
        |  FROM events GROUP BY 1, 2),
        |l AS (
        |  SELECT event_type, day, y,
        |         lag(y, 7) OVER (PARTITION BY event_type ORDER BY day)
        |           AS p7
        |  FROM daily),
        |e AS (SELECT event_type, y - p7 AS e FROM l WHERE p7 IS NOT NULL),
        |tot AS (
        |  SELECT event_type, (10 * count(*) + 99) // 100 AS lo_r,
        |         (90 * count(*) + 99) // 100 AS hi_r
        |  FROM e GROUP BY 1),
        |rk AS (
        |  SELECT event_type, e,
        |         cast(row_number() OVER (PARTITION BY event_type
        |                                 ORDER BY e) AS bigint) AS r
        |  FROM e),
        |band AS (
        |  SELECT rk.event_type,
        |         min(CASE WHEN r = lo_r THEN e END) AS elo,
        |         max(CASE WHEN r = hi_r THEN e END) AS ehi
        |  FROM rk JOIN tot USING (event_type) GROUP BY 1),
        |anchor AS (SELECT event_type, max(day) AS d1 FROM daily GROUP BY 1)
        |SELECT d.event_type, d.day + 7 AS day,
        |       cast(date_diff('day', a.d1, d.day + 7) AS bigint)
        |         AS horizon,
        |       y AS point_micro, y + elo AS lo_micro, y + ehi AS hi_micro
        |FROM daily d JOIN anchor a USING (event_type)
        |     JOIN band USING (event_type)
        |WHERE d.day > a.d1 - 7
        |ORDER BY d.event_type, day""".stripMargin,
    "q_rolling_median" ->
      """SELECT event_type, event_id, value,
        |       quantile_cont(cast(round(value * 1000000) AS bigint), 0.5)
        |         OVER (PARTITION BY event_type ORDER BY event_id
        |               ROWS BETWEEN 49 PRECEDING AND CURRENT ROW) AS med_micro
        |FROM events
        |ORDER BY event_type, event_id""".stripMargin,
    "q_detrend" ->
      s"""WITH $detrendCte
         |SELECT event_type, day, day_micro, trend_micro, resid_micro
         |FROM det ORDER BY event_type, day""".stripMargin,
    "q_anomaly" ->
      s"""WITH $detrendCte,
         |med AS (
         |  SELECT event_type, quantile_cont(resid_micro, 0.5) AS med
         |  FROM det GROUP BY event_type),
         |mad AS (
         |  SELECT d.event_type,
         |         quantile_cont(abs(resid_micro - med), 0.5) AS mad
         |  FROM det d JOIN med USING (event_type)
         |  GROUP BY d.event_type)
         |SELECT d.event_type, day, day_micro, trend_micro, resid_micro,
         |       abs(resid_micro - med) > 3 * mad AS is_anomaly
         |FROM det d JOIN med USING (event_type) JOIN mad USING (event_type)
         |ORDER BY d.event_type, day""".stripMargin,
    "q_gap_fill" ->
      """WITH daily AS (
        |  SELECT user_id, ts::DATE AS day, count(*) AS n,
        |         cast(sum(cast(round(value * 1000000) AS bigint)) AS bigint)
        |           AS day_micro
        |  FROM events GROUP BY 1, 2),
        |span AS (
        |  SELECT user_id, min(day) AS d0, max(day) AS d1
        |  FROM daily GROUP BY user_id),
        |grid AS (
        |  SELECT user_id,
        |         unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
        |  FROM span)
        |SELECT g.user_id, g.day,
        |       coalesce(d.n, 0) AS n_events,
        |       d.n IS NOT NULL AS observed,
        |       last_value(d.day_micro IGNORE NULLS) OVER (
        |         PARTITION BY g.user_id ORDER BY g.day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        |       ) AS filled_micro
        |FROM grid g LEFT JOIN daily d USING (user_id, day)
        |ORDER BY g.user_id, g.day""".stripMargin,
    "q_skyline" ->
      """SELECT p.p_partkey, p.p_retailprice, p.p_size
        |FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_retailprice <= p.p_retailprice
        |    AND q.p_size >= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
        |ORDER BY p.p_partkey""".stripMargin,
    "q_zorder" -> {
      val bx = "((user_id - _u0) * 256 // (_u1 - _u0 + 1))"
      val by = "((_vm - _v0) * 256 // (_v1 - _v0 + 1))"
      s"""WITH q AS (
         |  SELECT user_id, cast(round(value * 1000000) AS bigint) AS _vm,
         |         value
         |  FROM events),
         |bounds AS (
         |  SELECT min(user_id) AS _u0, max(user_id) AS _u1,
         |         min(_vm) AS _v0, max(_vm) AS _v1 FROM q),
         |coded AS (
         |  SELECT user_id, value, ${zExpr(bx, by, "//")} AS _z
         |  FROM q, bounds)
         |SELECT _z // 2048 AS shard, count(*) AS n,
         |       min(user_id) AS min_user, max(user_id) AS max_user,
         |       min(value) AS min_value, max(value) AS max_value
         |FROM coded GROUP BY 1 ORDER BY shard""".stripMargin
    })
}
