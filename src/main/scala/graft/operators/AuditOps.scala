package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-12 distribution / drift / integrity audits over the change-event
  * log and the corpus — the data-quality panel a 100 TB ingest runs
  * before anyone trains on (or alerts off) the data: mean-shift
  * changepoints, two-sample KS drift, Gini concentration, winsorized
  * robust means, inter-arrival burstiness, cross-surface audience
  * overlap, seasonal adjustment, sequence-continuity gaps, Heaps-law
  * vocabulary growth, the dedup-threshold yield curve, sessionization
  * with entry-type bounce reporting, conversion-delay quantiles, the
  * Markov stationary distribution, a deterministic multiplier-bootstrap
  * CI, and Neyman sample-budget allocation.
  *
  * Reference grounding: the reference's core loop is integrity over an
  * ordered sequence (restart LSN bookkeeping, monotonic commit guards —
  * ext/_informixcdcmodule.ec:581-771); `seqGaps` is that continuity
  * check as a query, and the rest are the statistical audits a
  * change-stream consumer layers on top of the materialized log.
  *
  * Engine-parity discipline (the round-11 lesson, twice over): every
  * metric is integer micro-units end to end; wide sums carry in
  * decimal(38,0) on the Spark side and HUGEINT on the DuckDB side with
  * every output column cast back to BIGINT (DuckDB widens integer sums
  * to HUGEINT, which pandas renders float64 — value-equal to Spark's
  * long but a different type, so the driver's type-sensitive hash
  * fails); `div`/`//` only ever divide non-negative quantities, where
  * truncation and flooring agree.
  */
object AuditOps {

  /** (event_type, day, day_micro) daily grain — the shared head of the
    * series audits: ONE hash aggregation collapses the event log, with
    * each value quantized to integer micros BEFORE the sum so
    * partitioning can't move a micro. Everything downstream is bounded
    * by types × calendar, never by events. */
  private def dailyMicro(events: DataFrame): DataFrame =
    events
      .select(col("event_type"), to_date(col("ts")).as("day"),
        expr("cast(round(value * 1000000) AS bigint)").as("_vm"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("_vm")).as("_y"))

  /** CUSUM mean-shift changepoint (r12): per event type, the day k that
    * maximizes |n·S_k − k·S_n| over the daily series — the single
    * strongest "the level changed HERE" split (one step of binary
    * segmentation), reported with the before/after means. The alerting
    * complement to [[SeriesOps]]' anomaly flags: anomalies are single
    * bad days; a changepoint is a regime shift.
    *
    * Exactness: the CUSUM objective |n·S_k − k·S| is pure long
    * arithmetic over micro-quantized prefix sums (n ≤ days, S ≤ 1e13
    * micros — products stay far under 2⁶³); the argmax tie-breaks to the
    * earliest day by a total (D desc, day asc) order; all divisions are
    * non-negative by construction (values > 0), so `div`/`//` agree.
    *
    * 100 TB shape: the daily aggregation is the only data-scaled
    * shuffle; the prefix window, 1-row-per-type totals (broadcast), and
    * the argmax window all run on the bounded daily table. The shared
    * daily frame is a Materialize barrier (the [[seasonalAdjust]]
    * convention), so its two consumers (`run`, `tot`) reuse one
    * aggregation by construction, not by optimistic exchange reuse. */
  private[graft] def changepointDaily(events: DataFrame): DataFrame = {
    val daily = Materialize(dailyMicro(events))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val run = daily
      .withColumn("_k", row_number().over(w).cast("long"))
      .withColumn("_sk", sum(col("_y")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("_n"), sum(col("_y")).as("_s"))
    val cand = run.join(broadcast(tot), Seq("event_type"))
      .filter(col("_k") < col("_n"))
      .withColumn("_d", abs(col("_n") * col("_sk") - col("_k") * col("_s")))
    cand
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("_d").desc, col("day"))))
      .filter(col("_rn") === 1)
      .select(col("event_type"), col("day").as("split_day"),
        col("_k").as("k_days"), col("_n").as("n_days"),
        expr("_d div _n").as("cusum_micro"),
        expr("_sk div _k").as("mean_left_micro"),
        expr("(_s - _sk) div (_n - _k)").as("mean_right_micro"),
        expr("(_s - _sk) div (_n - _k) - _sk div _k").as("shift_micro"))
  }

  private def qChangepoint(s: SparkSession, d: String): DataFrame =
    changepointDaily(Tables.events(s, d)).orderBy(col("event_type"))

  /** Exact two-sample Kolmogorov–Smirnov drift statistic (r12): per
    * event type, split the stream into its first and second halves by
    * LSN order and report max |F₁(v) − F₂(v)| — the distribution-shift
    * gate (beside the binned PSI of `q_drift_psi`) that says whether the
    * VALUES a type produces have drifted, not just their rate. KS needs
    * no binning choice, which is exactly why audits keep both.
    *
    * Exactness: the ECDF difference at value v is |C₁·n₂ − C₂·n₁| /
    * (n₁·n₂) — held as the exact integer numerator until one final
    * micro-division, with the cross products carried in decimal(38,0)
    * (Spark) / HUGEINT (DuckDB) like `q_gini`: at ~3·10⁹ rows per type
    * the C·n products pass 2⁶³, so plain-long arithmetic would wrap
    * exactly where the audit matters most. `ks_micro` ≤ 10⁶ is always
    * exact; the reported `ks_num` numerator is cast to long at the
    * output edge (exceeds 2⁶³ only past ~3·10⁹ rows per type — the
    * statistic itself never does). The half-split is row_number ≤
    * n div 2 over the unique (event_id) order, so both engines label
    * identical rows.
    *
    * 100 TB shape: one rank window and one (type, value) aggregation —
    * both on the type key; the cumulative window runs over the DISTINCT
    * value grid per type (the ECDF's own size — a value-heavy type costs
    * what its ECDF costs; the production shortcut is quantile-sketch
    * pre-binning, which turns this into `q_drift_psi`). */
  private[graft] def ksDrift(events: DataFrame): DataFrame = {
    val t = events.select(col("event_type"), col("event_id"),
      expr("cast(round(value * 1000000) AS bigint)").as("_vm"))
    val tot = t.groupBy(col("event_type")).agg(count(lit(1)).as("_n"))
      .select(col("event_type"), expr("_n div 2").as("_n1"),
        expr("_n - _n div 2").as("_n2"))
    val ranked = t
      .withColumn("_rid", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("event_id"))))
      .join(broadcast(tot), Seq("event_type"))
    val g = ranked.groupBy(col("event_type"), col("_n1"), col("_n2"),
        col("_vm"))
      .agg(sum(when(col("_rid") <= col("_n1"), 1L).otherwise(0L)).as("_c1"),
        sum(when(col("_rid") > col("_n1"), 1L).otherwise(0L)).as("_c2"))
    val wc = Window.partitionBy(col("event_type")).orderBy(col("_vm"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g.withColumn("_cc1", sum(col("_c1")).over(wc))
      .withColumn("_cc2", sum(col("_c2")).over(wc))
      .groupBy(col("event_type"), col("_n1").as("n1"), col("_n2").as("n2"))
      .agg(max(abs(expr("cast(_cc1 AS decimal(38,0)) * _n2")
          - expr("cast(_cc2 AS decimal(38,0)) * _n1"))).as("_ksd"))
      // A 1-event type has an empty first half — a one-sided KS is
      // meaningless AND its n1·n2 = 0 denominator is an ERROR in DuckDB
      // (Spark's div yields NULL): degenerate groups are excluded, not
      // reported as noise.
      .filter(col("n1") > 0)
      .select(col("event_type"), col("n1"), col("n2"),
        col("_ksd").cast("long").as("ks_num"),
        expr("_ksd * 1000000 div (cast(n1 AS decimal(38,0)) * n2)")
          .as("ks_micro"))
  }

  private def qKsDrift(s: SparkSession, d: String): DataFrame =
    ksDrift(Tables.events(s, d)).orderBy(col("event_type"))

  /** Gini concentration coefficient (r12): per event type over strictly
    * positive values — the single-number inequality read beside
    * `q_concentration`'s top-N shares (the Lorenz-curve area instead of
    * point samples of it). G = (2·Σᵢ i·vᵢ − (n+1)·Σv) / (n·Σv) over the
    * ascending value order.
    *
    * Exactness: rank·value products are carried in decimal(38,0)
    * (Spark) / HUGEINT (DuckDB) — at 100 TB the Σ i·vᵢ term is ~n²·v̄,
    * past long — and ONE integral division at the edge emits micro
    * units. Rank ties can't move the result: equal values contribute the
    * same Σ i·v under any tie permutation. The numerator is non-negative
    * (values sorted ascending), so truncate == floor.
    *
    * 100 TB shape: one rank window on the type key, one aggregation;
    * nothing global. */
  private[graft] def giniByGroup(events: DataFrame): DataFrame = {
    val t = events.select(col("event_type"),
        expr("cast(round(value * 1000000) AS bigint)").as("_vm"))
      .filter(col("_vm") > 0)
    t.withColumn("_r", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("_vm"))).cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("_vm")).as("total_micro"),
        sum(expr("cast(_r AS decimal(38,0)) * _vm")).as("_siv"))
      .select(col("event_type"), col("n"), col("total_micro"),
        expr("""(2 * _siv - (n + 1) * cast(total_micro AS decimal(38,0)))
               | * 1000000
               | div (cast(n AS decimal(38,0)) * total_micro)""".stripMargin)
          .as("gini_micro"))
  }

  private def qGini(s: SparkSession, d: String): DataFrame =
    giniByGroup(Tables.events(s, d)).orderBy(col("event_type"))

  /** Winsorized robust summary (r12): per event type, the rank-based
    * p05/p95 clamp bounds, how many rows each side clamps, and the
    * winsorized mean — the "trim the tails before averaging" read that
    * keeps a metric dashboard honest against outliers without dropping
    * rows (the clamping complement to `q_mad_outliers`' flagging).
    *
    * Exactness: bounds are the VALUES at ranks ⌈0.05n⌉ / ⌈0.95n⌉
    * (ceil via `(p·n + 99) div 100` — integer, no quantile
    * interpolation anywhere, so no float at all); the value at a rank is
    * well-defined under ties (the sorted multiset doesn't care which
    * tied ROW holds the rank). Clamped sums are long micro sums.
    *
    * 100 TB shape: one rank window on the type key; bounds are
    * 1-row-per-type (broadcast back); the final aggregation reuses the
    * ranked rows — two exchanges total, both type-keyed. */
  private[graft] def winsorize(events: DataFrame): DataFrame = {
    val t = events.select(col("event_type"), col("event_id"),
      expr("cast(round(value * 1000000) AS bigint)").as("_vm"))
    val ranked = t.withColumn("_r", row_number().over(
      Window.partitionBy(col("event_type"))
        .orderBy(col("_vm"), col("event_id"))).cast("long"))
    val tot = t.groupBy(col("event_type")).agg(count(lit(1)).as("_n"))
      .select(col("event_type"), col("_n"),
        expr("(5 * _n + 99) div 100").as("_lo_r"),
        expr("(95 * _n + 99) div 100").as("_hi_r"))
    val withR = ranked.join(broadcast(tot), Seq("event_type"))
    val bounds = withR
      .filter(col("_r") === col("_lo_r") || col("_r") === col("_hi_r"))
      .groupBy(col("event_type"))
      .agg(min(when(col("_r") === col("_lo_r"), col("_vm"))).as("_lo"),
        max(when(col("_r") === col("_hi_r"), col("_vm"))).as("_hi"))
    withR.join(broadcast(bounds), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(max(col("_n")).as("n"),
        max(col("_lo")).as("lo_micro"), max(col("_hi")).as("hi_micro"),
        sum(when(col("_vm") < col("_lo"), 1L).otherwise(0L))
          .as("n_clamped_lo"),
        sum(when(col("_vm") > col("_hi"), 1L).otherwise(0L))
          .as("n_clamped_hi"),
        sum(greatest(col("_lo"), least(col("_hi"), col("_vm"))))
          .as("_ws"))
      .select(col("event_type"), col("n"), col("lo_micro"),
        col("hi_micro"), col("n_clamped_lo"), col("n_clamped_hi"),
        expr("_ws div n").as("wmean_micro"))
  }

  private def qWinsorize(s: SparkSession, d: String): DataFrame =
    winsorize(Tables.events(s, d)).orderBy(col("event_type"))

  /** Inter-arrival burstiness (r12): per event type, the squared
    * coefficient of variation of consecutive-event gaps — CV² = 1 is a
    * Poisson arrival process, ≫ 1 is bursty, ≪ 1 is metronomic. The
    * capacity-planning read on the raw event clock (a bursty type needs
    * peak provisioning its mean rate hides).
    *
    * Exactness: gaps are exact microsecond longs (`unix_micros` /
    * `epoch_us` — same integer in both engines under the UTC session);
    * tied timestamps can't move the answer (reordering equal values
    * leaves the multiset of consecutive differences unchanged); Σg² runs
    * in decimal(38,0) / HUGEINT (g² alone brushes 2⁶³ at day-scale
    * gaps); CV²·1e6 = (n·Σg² − (Σg)²)·1e6 ÷ (Σg)² is one non-negative
    * integral division at the edge.
    *
    * 100 TB shape: one lag window and one aggregation, both on the type
    * key; fixed-width state. */
  private[graft] def burstiness(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("_us"), col("event_id"))
    events
      .select(col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("_us"))
      .withColumn("_g", col("_us") - lag(col("_us"), 1).over(w))
      .filter(col("_g").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"), sum(col("_g")).as("_sg"),
        sum(expr("cast(_g AS decimal(38,0)) * _g")).as("_sg2"))
      .select(col("event_type"), col("n_gaps"),
        expr("_sg div n_gaps").as("mean_gap_us"),
        // all-zero gaps (every event at one instant) → NULL, not a
        // divide-by-zero (an ERROR in DuckDB, NULL in Spark — the same
        // guard keeps both engines on the NULL branch)
        expr("""CASE WHEN _sg = 0 THEN NULL ELSE
               | (cast(n_gaps AS decimal(38,0)) * _sg2
               |  - cast(_sg AS decimal(38,0)) * _sg) * 1000000
               | div (cast(_sg AS decimal(38,0)) * _sg) END""".stripMargin)
          .as("cv2_micro"))
  }

  private def qBurstiness(s: SparkSession, d: String): DataFrame =
    burstiness(Tables.events(s, d)).orderBy(col("event_type"))

  /** Cross-surface audience overlap (r12): Jaccard similarity of the
    * distinct-user sets of every event-type pair — the "do these two
    * features share an audience" read behind retention and
    * cross-sell analysis, and the user-space twin of the corpus
    * similarity operators (same |A∩B| / |A∪B|, different universe).
    *
    * 100 TB shape: ONE distinct aggregation collapses the log to
    * (type, user) pairs; the pair join is keyed on user_id
    * (co-partitioned self-join — each user contributes ≤ C(|types|,2)
    * rows); per-type sizes are a bounded broadcast. Nothing is all-pairs
    * in the user dimension. */
  private[graft] def userOverlap(events: DataFrame): DataFrame = {
    val d = events.select(col("event_type"), col("user_id")).distinct()
    val sizes = d.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val inter = d.alias("a").join(d.alias("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes.select(col("event_type").as("type_a"),
        col("n").as("n_a"))), Seq("type_a"))
      .join(broadcast(sizes.select(col("event_type").as("type_b"),
        col("n").as("n_b"))), Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("inter"),
        expr("inter * 1000000 div (n_a + n_b - inter)").as("jaccard_micro"))
  }

  private def qUserOverlap(s: SparkSession, d: String): DataFrame =
    userOverlap(Tables.events(s, d)).orderBy(col("type_a"), col("type_b"))

  /** Seasonally adjusted daily series (r12): each (type, day) total
    * divided by its weekday's seasonality index from
    * [[SeriesOps.weekdayProfile]] — the composition the profile exists
    * for: once the weekly shape is divided out, day-over-day comparisons
    * and the anomaly gate stop firing on "it's Sunday".
    *
    * Exactness: the index is the profile's exact integer micro-ratio
    * (identical arithmetic to `q_weekday_profile`, derived HERE from one
    * shared daily frame so events scan once — the profile query's own
    * form would re-aggregate the log); the adjustment is one
    * non-negative integer micro-division per day (NULL on a zero index —
    * both engines share the guard).
    *
    * 100 TB shape: the daily aggregation is the only data-scaled
    * shuffle; the dow roll-up, per-type base, and the 7-rows-per-type
    * index all run on (and broadcast back onto) the bounded daily
    * table. */
  private[graft] def seasonalAdjust(events: DataFrame): DataFrame = {
    val daily = Materialize(dailyMicro(events)
      .withColumn("dow", expr("cast(weekday(day) + 1 AS int)")))
    val byDow = daily.groupBy(col("event_type"), col("dow"))
      .agg(expr("sum(_y) div count(1)").as("_avg"))
    val base = daily.groupBy(col("event_type"))
      .agg(expr("sum(_y) div count(1)").as("_base"))
    val idx = byDow.join(base, Seq("event_type"))
      .select(col("event_type"), col("dow"),
        expr("_avg * 1000000 div _base").as("ratio_micro"))
    daily.join(broadcast(idx), Seq("event_type", "dow"))
      .select(col("event_type"), col("day"), col("_y").as("day_micro"),
        col("ratio_micro"),
        when(col("ratio_micro") > 0,
          expr("_y * 1000000 div ratio_micro")).as("adj_micro"))
  }

  private def qSeasonalAdjust(s: SparkSession, d: String): DataFrame =
    seasonalAdjust(Tables.events(s, d))
      .orderBy(col("event_type"), col("day"))

  /** Sequence-continuity gap audit (r12): per event type, the missing
    * LSN ranges in its id sequence — count, total missing, and the
    * single largest gap with its start. The reference's whole existence
    * is a CONTIGUOUS change sequence (restart LSN bookkeeping,
    * ec:581-661; monotonic guards, ec:747) — this is that continuity
    * contract as a batch audit over the materialized log ("did capture
    * drop a range?").
    *
    * 100 TB shape: one lead window on the type key, then a bounded
    * per-type aggregation; the largest-gap argmax is a lexicographic
    * struct max (partial+final, no second window), tie to the earliest
    * start via the negated-start trick. */
  private[graft] def seqGaps(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
    val gaps = events.select(col("event_type"), col("event_id"))
      .withColumn("_nxt", lead(col("event_id"), 1).over(w))
      .filter(col("_nxt") > col("event_id") + 1)
      .select(col("event_type"),
        (col("event_id") + 1).as("_gs"),
        (col("_nxt") - col("event_id") - 1).as("_gl"))
    gaps.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"), sum(col("_gl")).as("missing_total"),
        max(struct(col("_gl").as("l"), (-col("_gs")).as("ns"))).as("_m"))
      .select(col("event_type"), col("n_gaps"), col("missing_total"),
        col("_m.l").as("max_gap_len"), (-col("_m.ns")).as("max_gap_start"))
  }

  private def qSeqGaps(s: SparkSession, d: String): DataFrame =
    seqGaps(Tables.events(s, d)).orderBy(col("event_type"))

  /** Heaps-law vocabulary growth (r12): distinct-token count after each
    * fifth of the corpus (by doc-id order) — the curve that says whether
    * a tokenizer's vocab is sized for the corpus it will actually see
    * (still-climbing = under-sampled; flat = saturated). Completes the
    * vocab toolkit: `q_vocab_coverage` reads the END state, this reads
    * the trajectory.
    *
    * 100 TB shape: ONE token aggregation (min first-doc per token) is
    * the only data-scaled shuffle — no per-checkpoint rescan: each
    * token's first appearance lands in exactly one of 5 id-range
    * buckets (integer arithmetic off a 1-row min/max broadcast, the
    * q_histogram shape), and the cumulative sum runs over 5 rows. */
  private[graft] def vocabGrowth(docs: DataFrame): DataFrame = {
    val b = docs.agg(min(col("doc_id")).as("_d0"), max(col("doc_id")).as("_d1"))
    def ckpt(c: String) = s"(($c - _d0) * 5) div (_d1 - _d0 + 1) + 1"
    val firsts = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok")).agg(min(col("doc_id")).as("_fd"))
    val fb = firsts.crossJoin(broadcast(b))
      .groupBy(expr(ckpt("_fd")).as("ckpt"))
      .agg(count(lit(1)).as("_nt"))
    val db = docs.crossJoin(broadcast(b))
      .groupBy(expr(ckpt("doc_id")).as("ckpt"))
      .agg(count(lit(1)).as("_nd"))
    val spine = b.select(explode(expr("sequence(1L, 5L)")).as("ckpt"))
    val wc = Window.orderBy(col("ckpt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(fb, Seq("ckpt"), "left").join(db, Seq("ckpt"), "left")
      .select(col("ckpt"),
        sum(coalesce(col("_nd"), lit(0L))).over(wc).as("n_docs"),
        coalesce(col("_nt"), lit(0L)).as("new_tokens"),
        sum(coalesce(col("_nt"), lit(0L))).over(wc).as("vocab_size"))
  }

  private def qVocabGrowth(s: SparkSession, d: String): DataFrame =
    vocabGrowth(Tables.documents(s, d)).orderBy(col("ckpt"))

  /** Dedup-threshold yield curve (r12): for Jaccard thresholds 50–90%,
    * how many near-dup pairs fire, how many docs would be removed under
    * the keep-smallest-id policy (a doc is removed iff it has a
    * ≥-threshold near-dup with a smaller id — `q_exact_dedup`'s keep-min
    * convention on the pair graph), and how many docs survive. THE
    * capacity-planning number for a dedup rollout: the threshold knob
    * priced in retained corpus size before anyone commits to one.
    *
    * 100 TB shape: the pair set is computed ONCE by the shared
    * MinHash+LSH machinery ([[LlmQueries.minhashPairsUnordered]] — band
    * equi-joins, never all-pairs) at the loosest threshold; the
    * five-threshold sweep then runs over the near-dup pairs alone
    * (copies-not-corpus small), so widening the sweep costs nothing
    * extra at the corpus scale. */
  private[graft] def dedupYield(docs: DataFrame): DataFrame = {
    val pairs = LlmQueries
      .minhashPairsUnordered(docs, "doc_id", "text", 0.5)
    val spine = docs.agg(count(lit(1)).as("_nd"))
      .select(col("_nd"),
        explode(expr("array(50L, 60L, 70L, 80L, 90L)")).as("pct"))
    val hits = pairs.crossJoin(broadcast(spine.select("pct")))
      .filter(col("jaccard") >= col("pct") / lit(100.0))
      .groupBy(col("pct"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("doc_b")).as("n_removed"))
    spine.join(hits, Seq("pct"), "left")
      .select(col("pct"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        (col("_nd") - coalesce(col("n_removed"), lit(0L))).as("n_kept"))
  }

  private def qDedupYield(s: SparkSession, d: String): DataFrame =
    dedupYield(Tables.documents(s, d)).orderBy(col("pct"))

  /** 30-minute sessionization gap, in microseconds. */
  private val SessionGapUs = 30L * 60 * 1000000

  /** Batch sessionization with an entry-type report (r12): users'
    * event runs split at 30-minute silences (the batch gaps-and-islands
    * twin of the streaming `s_session_window`), rolled up by each
    * session's ENTRY event type — sessions started, bounce rate
    * (1-event sessions), events and duration per session. The
    * "which entry point produces real engagement" read behind every
    * landing-page argument.
    *
    * Exactness: timestamps are exact epoch micros; the entry event is a
    * lexicographic struct min over the unique (ts, event_id) order — the
    * type field can never participate in the comparison; ratios are
    * non-negative integer micro-divisions.
    *
    * 100 TB shape: ONE user-keyed exchange carries the session-boundary
    * window AND the per-(user, session) aggregation (same key — no
    * second shuffle); the entry-type roll-up is bounded by |types|.
    * Session state per partition slot is one lag value. */
  private[graft] def sessionStats(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("_us"),
      col("event_id"))
    val sess = events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("_us"))
      .withColumn("_prev", lag(col("_us"), 1).over(w))
      .withColumn("_new",
        when(col("_prev").isNull ||
          col("_us") - col("_prev") > SessionGapUs, 1L).otherwise(0L))
      .withColumn("_sid", sum(col("_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val per = sess.groupBy(col("user_id"), col("_sid"))
      .agg(count(lit(1)).as("_n"),
        min(struct(col("_us"), col("event_id"), col("event_type")))
          .as("_first"),
        min(col("_us")).as("_t0"), max(col("_us")).as("_t1"))
    per.groupBy(col("_first.event_type").as("entry_type"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("_n") === 1, 1L).otherwise(0L)).as("n_bounce"),
        sum(col("_n")).as("_ne"),
        sum(col("_t1") - col("_t0")).as("_sd"),
        max(col("_t1") - col("_t0")).as("max_duration_us"))
      .select(col("entry_type"), col("n_sessions"), col("n_bounce"),
        expr("n_bounce * 1000000 div n_sessions").as("bounce_micro"),
        expr("_ne * 1000000 div n_sessions").as("avg_events_micro"),
        expr("_sd div n_sessions").as("avg_duration_us"),
        col("max_duration_us"))
  }

  private def qSessionStats(s: SparkSession, d: String): DataFrame =
    sessionStats(Tables.events(s, d)).orderBy(col("entry_type"))

  /** First-view → first-purchase conversion delay (r12): one row —
    * viewer count, converter count (first purchase strictly after first
    * view), conversion micro-rate, and the delay distribution at
    * rank-based p25/p50/p75/p90 — the time-to-convert read product and
    * capacity decisions hang on ("how long is the consideration
    * window?").
    *
    * Exactness: the quantiles are the VALUES at ranks ⌈q·n⌉ (the
    * q_winsorize rank-ceil — no interpolation, no float); delays are
    * exact micro differences of per-user min timestamps.
    *
    * 100 TB shape: ONE user-keyed aggregation (conditional mins —
    * map-side partials) collapses the log; the rank window then runs
    * over CONVERTING USERS only. That window is a single-partition sort
    * of the converter set — the exact demo form (the q_profile
    * convention); at full scale the same report reads off
    * `Graft.approxQuantiles`' GK sketch instead. */
  private[graft] def convertDelay(events: DataFrame): DataFrame = {
    val per = events
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view",
          unix_micros(col("ts")))).as("_v"),
        min(when(col("event_type") === "purchase",
          unix_micros(col("ts")))).as("_p"))
    val viewers = per.agg(
      sum(when(col("_v").isNotNull, 1L).otherwise(0L)).as("n_viewers"))
    val delays = per
      .filter(col("_v").isNotNull && col("_p").isNotNull &&
        col("_p") > col("_v"))
      .select((col("_p") - col("_v")).as("_delay"))
    val ranked = delays
      .withColumn("_r", row_number().over(Window.orderBy(col("_delay")))
        .cast("long"))
      .crossJoin(broadcast(delays.agg(count(lit(1)).as("n_converted"))))
    def pick(q: Int) =
      min(when(col("_r") === expr(s"($q * n_converted + 99) div 100"),
        col("_delay"))).as(s"p${q}_us")
    ranked.groupBy(col("n_converted"))
      .agg(pick(25), pick(50), pick(75), pick(90))
      .crossJoin(broadcast(viewers))
      .select(col("n_viewers"), col("n_converted"),
        expr("n_converted * 1000000 div n_viewers").as("cvr_micro"),
        col("p25_us"), col("p50_us"), col("p75_us"), col("p90_us"))
  }

  private def qConvertDelay(s: SparkSession, d: String): DataFrame =
    convertDelay(Tables.events(s, d))

  /** Stationary distribution of the event-type Markov chain (r12):
    * three unrolled power-iteration rounds π′(j) = (Σᵢ π(i)·P(i,j)) div
    * 1e6 from the uniform start, over the same lead-pair transition
    * matrix as `q_transitions` — "where does the user flow settle",
    * the fixed-point read on top of the one-step probabilities (the
    * type-graph twin of `q_graph_pagerank`'s integer-micro iteration
    * discipline).
    *
    * Exactness: P is the exact micro matrix (floored row entries — both
    * engines share the floor); each round sums exact micro² products
    * THEN floors once. Rounds are unrolled joins over the K×K matrix.
    *
    * 100 TB shape: the lead window and pair count are the only
    * data-scaled steps (one user-keyed exchange + one K²-group agg);
    * the iterations run on broadcast K-row / K²-row frames. */
  private[graft] def markovStationary(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val m = events
      .select(col("user_id"), col("event_id"), col("event_type"))
      .withColumn("_nxt", lead(col("event_type"), 1).over(w))
      .filter(col("_nxt").isNotNull)
      .groupBy(col("event_type").as("_from"), col("_nxt").as("_to"))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_p", expr(
        "_n * 1000000 div sum(_n) OVER (PARTITION BY _from)"))
    val spine = m.select(col("_from").as("event_type")).distinct()
    val k = spine.agg(count(lit(1)).as("_k"))
    val pi0 = spine.crossJoin(broadcast(k))
      .select(col("event_type"), expr("1000000 div _k").as("pi"))
    val pis = (1 to 3).scanLeft(pi0) { (pi, _) =>
      val stepped = pi.join(m, pi("event_type") === m("_from"))
        .groupBy(col("_to").as("event_type"))
        .agg(expr("sum(pi * _p) div 1000000").as("pi"))
      spine.join(stepped, Seq("event_type"), "left")
        .select(col("event_type"), coalesce(col("pi"), lit(0L)).as("pi"))
    }
    pis.zipWithIndex.map { case (df, i) =>
      df.select(col("event_type"), col("pi").as(s"pi${i}_micro"))
    }.reduce((a, b) => a.join(b, Seq("event_type")))
  }

  private def qMarkovStationary(s: SparkSession, d: String): DataFrame =
    markovStationary(Tables.events(s, d)).orderBy(col("event_type"))

  /** Bootstrap replica count. 16 replicas put the rank-2/rank-15 picks
    * at the ~6%/94% tails — a ~87.5% interval. */
  private val BootB = 16

  /** One replica weight: 8 three-bit fields of a 60-bit hash (starting
    * at bit `base`), each contributing 1 when zero — Binomial(8, 1/8),
    * mean 1, variance 7/8: the integer multiplier-bootstrap weight (the
    * deterministic stand-in for Poisson(1) resampling). A replica uses
    * 24 bits, so ONE hash seeds TWO replicas (base 0 and 24) — half the
    * per-row hashing. */
  private def bootWeight(h: String, base: Int,
      shift: (String, Int) => String): String =
    (0 until 8).map { k =>
      s"(CASE WHEN ${shift(h, base + 3 * k)} & 7 = 0 THEN 1 ELSE 0 END)"
    }.mkString(" + ")

  /** Deterministic multiplier-bootstrap confidence interval (r12): the
    * corpus mean with error bars from 16 hash-weighted replicas in ONE
    * scan — how a 100 TB metric gets a confidence interval without 16
    * resampling passes (the online/Poisson bootstrap, made
    * deterministic: each row's replica-b multiplicity is a
    * Binomial(8,1/8) function of a shared 60-bit hash of (id, b), so
    * both engines — and any re-run — draw identical pseudo-samples).
    *
    * Exactness: weights are small exact integers; every replica's Σw·v
    * and Σw are associative long sums folded in the SAME aggregation
    * (33 aggregates, one map-side pass); replica means are integer
    * micro-divisions; the interval picks are rank-based over the 16
    * sorted replica means (the q_winsorize convention — no
    * interpolation).
    *
    * 100 TB shape: one scan, ONE aggregation with fixed-width state;
    * everything after runs on 16 rows. The md5-per-(row, replica) demo
    * hash would swap for xxhash64 in production — the plan shape doesn't
    * change. */
  private[graft] def bootstrapCi(events: DataFrame): DataFrame = {
    val sparkShift = (e: String, n: Int) => s"shiftright($e, $n)"
    // The per-row hashing is the CPU-heavy stage — spread the narrow
    // (id, vm) projection so a single-row-group input doesn't serialize
    // 8 md5s/row onto one core (the Tables.spread rationale).
    val t = Tables.spread(events.sparkSession,
      events.select(col("event_id"),
        expr("cast(round(value * 1000000) AS bigint)").as("vm")))
    val withH = t.select(col("vm") +: (0 until BootB / 2).map { j =>
      expr(LlmQueries.h60Spark(
        s"concat(cast(event_id AS string), ':b$j')")).as(s"_h$j")
    }: _*)
    val withW = withH.select(col("vm") +: (0 until BootB).map { b =>
      expr(bootWeight(s"_h${b % (BootB / 2)}", if (b < BootB / 2) 0 else 24,
        sparkShift)).as(s"_w$b")
    }: _*)
    val aggs = sum(col("vm")).as("_s") +: (0 until BootB).flatMap(b => Seq(
      sum(expr(s"_w$b * vm")).as(s"_sv$b"),
      sum(col(s"_w$b")).as(s"_sw$b")))
    val m = withW.agg(count(lit(1)).as("n"), aggs: _*)
    val arms = (0 until BootB).map(b =>
      s"CASE WHEN _sw$b = 0 THEN NULL ELSE _sv$b div _sw$b END")
      .mkString(", ")
    val means = m
      .selectExpr("n", "_s div n AS mean_micro",
        s"explode(array($arms)) AS _m")
      // NULL arms (Σw=0, degenerate tiny inputs only) rank explicitly
      // LAST: Spark's ASC default is NULLS FIRST but DuckDB's is NULLS
      // LAST, so an unpinned order would let the rank-2/rank-15 interval
      // picks diverge between engine and oracle on such inputs.
      .withColumn("_rk",
        row_number().over(Window.orderBy(col("_m").asc_nulls_last)))
    means.groupBy(col("n"), col("mean_micro"))
      .agg(min(when(col("_rk") === 2, col("_m"))).as("boot_lo_micro"),
        min(when(col("_rk") === BootB - 1, col("_m"))).as("boot_hi_micro"))
      .select(col("n"), col("mean_micro"), col("boot_lo_micro"),
        col("boot_hi_micro"),
        (col("boot_hi_micro") - col("boot_lo_micro")).as("spread_micro"))
  }

  private def qBootstrapCi(s: SparkSession, d: String): DataFrame =
    bootstrapCi(Tables.events(s, d))

  /** Sample budget for [[neymanAlloc]]'s driver binding. */
  private val NeymanBudget = 1000L

  /** The shared corrected-sample-SD formula text (n ≥ 2): both engines
    * evaluate the SAME division/sqrt sequence over exact integer moment
    * sums — IEEE sqrt and division are correctly rounded, so the double
    * is bit-identical (the corrFormula discipline; contrast ln/exp,
    * which are NOT portable across libm implementations). */
  private def sdFormula(n: String, sx: String, sxx: String): String =
    s"sqrt((cast($n AS double) * cast($sxx AS double) - " +
      s"cast($sx AS double) * cast($sx AS double)) / " +
      s"(cast($n AS double) * (cast($n AS double) - 1)))"

  /** Neyman (variance-optimal) sample allocation (r12): how a fixed
    * label/review/eval budget should split across strata — allocate
    * ∝ Nᵢ·σᵢ, the split that minimizes the variance of the stratified
    * mean estimator. The statistics-driven companion to the mechanical
    * samplers (`q_stratified_sample` rates, `q_group_sample` fixed k):
    * a high-variance stratum EARNS samples; a near-constant one needs
    * almost none. Zero-variance corner: if every stratum is constant
    * (Σw = 0) the weights fall back to plain size-proportional.
    *
    * Exactness: moment sums are exact integers (decimal(38,0) for Σx²);
    * σ is the one shared double formula above; weights round to exact
    * longs; the allocation itself is INTEGER largest-remainder
    * apportionment — base = ⌊budget·wᵢ/Σw⌋, the leftover goes to the
    * largest remainders (ties to the earlier type) — so allocations sum
    * to the budget EXACTLY, in both engines, always.
    *
    * 100 TB shape: ONE moment aggregation (map-side partials) collapses
    * the log; the apportionment runs on |strata| rows with a 1-row total
    * broadcast. */
  private[graft] def neymanAlloc(events: DataFrame,
      budget: Long = NeymanBudget): DataFrame = {
    val m = events
      .select(col("event_type"),
        expr("cast(round(value * 1000000) AS bigint)").as("_vm"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("_vm")).as("_sx"),
        sum(expr("cast(_vm AS decimal(38,0)) * _vm")).as("_sxx"))
      .filter(col("n") > 1)
      .withColumn("_sd", expr(sdFormula("n", "_sx", "_sxx")))
      .withColumn("sd_micro", expr("cast(round(_sd) AS bigint)"))
      .withColumn("_w", expr("cast(round(cast(n AS double) * _sd) AS bigint)"))
    val tot = m.agg(sum(col("_w")).as("_tw"), sum(col("n")).as("_tn"))
    val j = m.crossJoin(broadcast(tot))
      .withColumn("weight",
        expr("CASE WHEN _tw = 0 THEN n ELSE _w END"))
      .withColumn("_den", expr("CASE WHEN _tw = 0 THEN _tn ELSE _tw END"))
      .withColumn("base", expr(s"$budget * weight div _den"))
      .withColumn("_rem", expr(s"$budget * weight % _den"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    j.withColumn("_rn", row_number().over(
        Window.orderBy(col("_rem").desc, col("event_type"))).cast("long"))
      .withColumn("_left", lit(budget) - sum(col("base")).over(wAll))
      .select(col("event_type"), col("n"), col("sd_micro"), col("weight"),
        (col("base") + when(col("_rn") <= col("_left"), 1L).otherwise(0L))
          .as("alloc"))
  }

  private def qNeymanAlloc(s: SparkSession, d: String): DataFrame =
    neymanAlloc(Tables.events(s, d)).orderBy(col("event_type"))

  /** Hour-of-week activity heatmap (r12): per type, each (ISO weekday,
    * hour) cell's event count, value total, and micro-share of the
    * type's overall value — the finer grain under
    * [[SeriesOps.weekdayProfile]] (capacity planning and anomaly
    * baselines key on the hour-of-week, not just the day).
    *
    * 100 TB shape: ONE (type, dow, hour) hash aggregation — ≤ 168
    * cells per type — with the 1-row-per-type totals broadcast back.
    * Exactness: micro-quantized long sums, integer share division. */
  private[graft] def hourProfile(events: DataFrame): DataFrame = {
    val cells = events
      .select(col("event_type"),
        expr("cast(weekday(to_date(ts)) + 1 AS int)").as("dow"),
        expr("cast(hour(ts) AS int)").as("hour"),
        expr("cast(round(value * 1000000) AS bigint)").as("_vm"))
      .groupBy(col("event_type"), col("dow"), col("hour"))
      .agg(count(lit(1)).as("n"), sum(col("_vm")).as("value_micro"))
    val tot = cells.groupBy(col("event_type"))
      .agg(sum(col("value_micro")).as("_tv"))
    cells.join(broadcast(tot), Seq("event_type"))
      .select(col("event_type"), col("dow"), col("hour"), col("n"),
        col("value_micro"),
        expr("value_micro * 1000000 div _tv").as("share_micro"))
  }

  private def qHourProfile(s: SparkSession, d: String): DataFrame =
    hourProfile(Tables.events(s, d))
      .orderBy(col("event_type"), col("dow"), col("hour"))

  /** Lorenz curve deciles (r12): per type, the cumulative micro-share of
    * total value held by the bottom d/10 of rows in ascending value
    * order — the CURVE whose enclosed area `q_gini` reports as one
    * number (the shape an inequality review actually plots: "the bottom
    * half of events carries X% of the value").
    *
    * Exactness: boundary rows are rank-ceil picks (⌈d·n/10⌉ — the
    * winsorize convention, well-defined under ties because the running
    * sum at a FIXED rank over sorted values is tie-permutation
    * invariant); shares are integer micro-divisions of exact long
    * running sums.
    *
    * 100 TB shape: one rank+prefix window on the type key (shared
    * exchange), boundary filter to ≤ 10 rows per type, totals broadcast. */
  private[graft] def lorenzDeciles(events: DataFrame): DataFrame = {
    val t = events.select(col("event_type"),
        expr("cast(round(value * 1000000) AS bigint)").as("_vm"))
      .filter(col("_vm") > 0)
    val w = Window.partitionBy(col("event_type")).orderBy(col("_vm"))
    val ranked = t
      .withColumn("_r", row_number().over(w).cast("long"))
      .withColumn("_cum", sum(col("_vm")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = t.groupBy(col("event_type"))
      .agg(count(lit(1)).as("_n"), sum(col("_vm")).as("_tv"))
    ranked.join(broadcast(tot), Seq("event_type"))
      .crossJoin(broadcast(tot.sparkSession.range(1, 11)
        .select(col("id").as("decile"))))
      .filter(col("_r") === expr("(decile * _n + 9) div 10"))
      .groupBy(col("event_type"), col("decile"))
      .agg(min(expr("_cum * 1000000 div _tv")).as("cum_share_micro"))
  }

  private def qLorenz(s: SparkSession, d: String): DataFrame =
    lorenzDeciles(Tables.events(s, d))
      .orderBy(col("event_type"), col("decile"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_changepoint" -> qChangepoint _,
    "q_ks_drift" -> qKsDrift _,
    "q_gini" -> qGini _,
    "q_winsorize" -> qWinsorize _,
    "q_burstiness" -> qBurstiness _,
    "q_user_overlap" -> qUserOverlap _,
    "q_seasonal_adjust" -> qSeasonalAdjust _,
    "q_seq_gaps" -> qSeqGaps _,
    "q_vocab_growth" -> qVocabGrowth _,
    "q_dedup_yield" -> qDedupYield _,
    "q_session_stats" -> qSessionStats _,
    "q_convert_delay" -> qConvertDelay _,
    "q_markov_stationary" -> qMarkovStationary _,
    "q_bootstrap_ci" -> qBootstrapCi _,
    "q_neyman_alloc" -> qNeymanAlloc _,
    "q_hour_profile" -> qHourProfile _,
    "q_lorenz" -> qLorenz _)

  /** Shared daily CTE (no leading WITH) — the [[dailyMicro]] twin, with
    * the HUGEINT→BIGINT cast at the sum. */
  private def dailyCte: String =
    """daily AS (
      |  SELECT event_type, ts::DATE AS day,
      |         cast(sum(cast(round(value * 1000000) AS bigint)) AS bigint)
      |           AS y
      |  FROM events GROUP BY 1, 2)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_changepoint" ->
      s"""WITH $dailyCte,
         |run AS (
         |  SELECT event_type, day, y,
         |         cast(row_number() OVER (PARTITION BY event_type
         |                                 ORDER BY day) AS bigint) AS k,
         |         cast(sum(y) OVER (PARTITION BY event_type ORDER BY day
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |           AS bigint) AS sk
         |  FROM daily),
         |tot AS (
         |  SELECT event_type, count(*) AS n, cast(sum(y) AS bigint) AS s
         |  FROM daily GROUP BY 1),
         |cand AS (
         |  SELECT r.event_type, day, k, n, sk, s,
         |         abs(n * sk - k * s) AS d
         |  FROM run r JOIN tot USING (event_type) WHERE k < n),
         |pick AS (
         |  SELECT *, row_number() OVER (PARTITION BY event_type
         |                               ORDER BY d DESC, day) AS rn
         |  FROM cand)
         |SELECT event_type, day AS split_day, k AS k_days, n AS n_days,
         |       d // n AS cusum_micro,
         |       sk // k AS mean_left_micro,
         |       (s - sk) // (n - k) AS mean_right_micro,
         |       (s - sk) // (n - k) - sk // k AS shift_micro
         |FROM pick WHERE rn = 1 ORDER BY event_type""".stripMargin,
    "q_ks_drift" ->
      """WITH t AS (
        |  SELECT event_type, event_id,
        |         cast(round(value * 1000000) AS bigint) AS vm
        |  FROM events),
        |tot AS (
        |  SELECT event_type, count(*) // 2 AS n1,
        |         count(*) - count(*) // 2 AS n2
        |  FROM t GROUP BY 1),
        |ranked AS (
        |  SELECT t.event_type, vm, n1, n2,
        |         row_number() OVER (PARTITION BY t.event_type
        |                            ORDER BY event_id) AS rid
        |  FROM t JOIN tot USING (event_type)),
        |g AS (
        |  SELECT event_type, n1, n2, vm,
        |         cast(sum(CASE WHEN rid <= n1 THEN 1 ELSE 0 END) AS bigint)
        |           AS c1,
        |         cast(sum(CASE WHEN rid > n1 THEN 1 ELSE 0 END) AS bigint)
        |           AS c2
        |  FROM ranked GROUP BY 1, 2, 3, 4),
        |cum AS (
        |  SELECT event_type, n1, n2,
        |         cast(sum(c1) OVER (PARTITION BY event_type ORDER BY vm
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS bigint) AS cc1,
        |         cast(sum(c2) OVER (PARTITION BY event_type ORDER BY vm
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS bigint) AS cc2
        |  FROM g)
        |SELECT event_type, n1, n2,
        |       cast(max(abs(cast(cc1 AS hugeint) * n2
        |                    - cast(cc2 AS hugeint) * n1)) AS bigint)
        |         AS ks_num,
        |       cast(max(abs(cast(cc1 AS hugeint) * n2
        |                    - cast(cc2 AS hugeint) * n1)) * 1000000
        |            // (cast(n1 AS hugeint) * n2) AS bigint) AS ks_micro
        |FROM cum WHERE n1 > 0
        |GROUP BY 1, 2, 3 ORDER BY event_type""".stripMargin,
    "q_gini" ->
      """WITH t AS (
        |  SELECT event_type, cast(round(value * 1000000) AS bigint) AS vm
        |  FROM events WHERE round(value * 1000000) > 0),
        |r AS (
        |  SELECT event_type, vm,
        |         cast(row_number() OVER (PARTITION BY event_type
        |                                 ORDER BY vm) AS bigint) AS rk
        |  FROM t),
        |m AS (
        |  SELECT event_type, count(*) AS n,
        |         cast(sum(vm) AS bigint) AS total_micro,
        |         sum(cast(rk AS hugeint) * vm) AS siv
        |  FROM r GROUP BY 1)
        |SELECT event_type, n, total_micro,
        |       cast((2 * siv - (n + 1) * cast(total_micro AS hugeint))
        |            * 1000000
        |            // (cast(n AS hugeint) * total_micro) AS bigint)
        |         AS gini_micro
        |FROM m ORDER BY event_type""".stripMargin,
    "q_winsorize" ->
      """WITH t AS (
        |  SELECT event_type, event_id,
        |         cast(round(value * 1000000) AS bigint) AS vm
        |  FROM events),
        |tot AS (
        |  SELECT event_type, count(*) AS n,
        |         (5 * count(*) + 99) // 100 AS lo_r,
        |         (95 * count(*) + 99) // 100 AS hi_r
        |  FROM t GROUP BY 1),
        |ranked AS (
        |  SELECT t.event_type, vm, n, lo_r, hi_r,
        |         cast(row_number() OVER (PARTITION BY t.event_type
        |                                 ORDER BY vm, event_id) AS bigint)
        |           AS rk
        |  FROM t JOIN tot USING (event_type)),
        |bounds AS (
        |  SELECT event_type,
        |         min(CASE WHEN rk = lo_r THEN vm END) AS lo,
        |         max(CASE WHEN rk = hi_r THEN vm END) AS hi
        |  FROM ranked GROUP BY 1)
        |SELECT r.event_type, max(n) AS n,
        |       max(lo) AS lo_micro, max(hi) AS hi_micro,
        |       cast(sum(CASE WHEN vm < lo THEN 1 ELSE 0 END) AS bigint)
        |         AS n_clamped_lo,
        |       cast(sum(CASE WHEN vm > hi THEN 1 ELSE 0 END) AS bigint)
        |         AS n_clamped_hi,
        |       cast(sum(greatest(lo, least(hi, vm))) AS bigint) // max(n)
        |         AS wmean_micro
        |FROM ranked r JOIN bounds USING (event_type)
        |GROUP BY 1 ORDER BY r.event_type""".stripMargin,
    "q_burstiness" ->
      """WITH t AS (
        |  SELECT event_type, event_id, epoch_us(ts) AS us FROM events),
        |g AS (
        |  SELECT event_type,
        |         us - lag(us, 1) OVER (PARTITION BY event_type
        |                               ORDER BY us, event_id) AS gp
        |  FROM t),
        |m AS (
        |  SELECT event_type, count(*) AS n_gaps,
        |         cast(sum(gp) AS bigint) AS sg,
        |         sum(cast(gp AS hugeint) * gp) AS sg2
        |  FROM g WHERE gp IS NOT NULL GROUP BY 1)
        |SELECT event_type, n_gaps, sg // n_gaps AS mean_gap_us,
        |       CASE WHEN sg = 0 THEN NULL ELSE
        |         cast((cast(n_gaps AS hugeint) * sg2
        |               - cast(sg AS hugeint) * sg) * 1000000
        |              // (cast(sg AS hugeint) * sg) AS bigint) END
        |         AS cv2_micro
        |FROM m ORDER BY event_type""".stripMargin,
    "q_user_overlap" ->
      """WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
        |i AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |         count(*) AS inter
        |  FROM d a JOIN d b
        |    ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2),
        |s AS (SELECT event_type, count(*) AS n FROM d GROUP BY 1)
        |SELECT type_a, type_b, sa.n AS n_a, sb.n AS n_b, inter,
        |       inter * 1000000 // (sa.n + sb.n - inter) AS jaccard_micro
        |FROM i JOIN s sa ON sa.event_type = type_a
        |       JOIN s sb ON sb.event_type = type_b
        |ORDER BY type_a, type_b""".stripMargin,
    "q_seasonal_adjust" ->
      s"""WITH $dailyCte,
         |dw AS (
         |  SELECT event_type, cast(isodow(day) AS integer) AS dow,
         |         cast(sum(y) // count(*) AS bigint) AS avg_micro
         |  FROM daily GROUP BY 1, 2),
         |base AS (
         |  SELECT event_type, cast(sum(y) // count(*) AS bigint) AS b
         |  FROM daily GROUP BY 1),
         |idx AS (
         |  SELECT event_type, dow, avg_micro * 1000000 // b AS ratio_micro
         |  FROM dw JOIN base USING (event_type))
         |SELECT d.event_type, day, y AS day_micro, ratio_micro,
         |       CASE WHEN ratio_micro > 0
         |            THEN y * 1000000 // ratio_micro END AS adj_micro
         |FROM daily d JOIN idx
         |  ON idx.event_type = d.event_type
         | AND idx.dow = cast(isodow(day) AS integer)
         |ORDER BY d.event_type, day""".stripMargin,
    "q_seq_gaps" ->
      """WITH g AS (
        |  SELECT event_type, event_id + 1 AS gs,
        |         lead(event_id, 1) OVER (PARTITION BY event_type
        |                                 ORDER BY event_id)
        |           - event_id - 1 AS gl
        |  FROM events),
        |gaps AS (SELECT * FROM g WHERE gl > 0),
        |agg AS (
        |  SELECT event_type, count(*) AS n_gaps,
        |         cast(sum(gl) AS bigint) AS missing_total
        |  FROM gaps GROUP BY 1),
        |top AS (
        |  SELECT event_type, gl AS max_gap_len, gs AS max_gap_start,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY gl DESC, gs) AS rn
        |  FROM gaps)
        |SELECT event_type, n_gaps, missing_total, max_gap_len,
        |       max_gap_start
        |FROM agg JOIN top USING (event_type)
        |WHERE rn = 1 ORDER BY event_type""".stripMargin,
    "q_vocab_growth" ->
      """WITH b AS (SELECT min(doc_id) AS d0, max(doc_id) AS d1
        |           FROM documents),
        |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents),
        |f AS (SELECT tok, min(doc_id) AS fd FROM tok WHERE tok <> ''
        |      GROUP BY tok),
        |fb AS (
        |  SELECT ((fd - d0) * 5) // (d1 - d0 + 1) + 1 AS ckpt,
        |         count(*) AS nt
        |  FROM f, b GROUP BY 1),
        |db AS (
        |  SELECT ((doc_id - d0) * 5) // (d1 - d0 + 1) + 1 AS ckpt,
        |         count(*) AS nd
        |  FROM documents, b GROUP BY 1),
        |spine AS (SELECT unnest(generate_series(1, 5)) AS ckpt)
        |SELECT s.ckpt,
        |       cast(sum(coalesce(nd, 0)) OVER (ORDER BY s.ckpt
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS bigint) AS n_docs,
        |       cast(coalesce(nt, 0) AS bigint) AS new_tokens,
        |       cast(sum(coalesce(nt, 0)) OVER (ORDER BY s.ckpt
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS bigint) AS vocab_size
        |FROM spine s LEFT JOIN fb ON fb.ckpt = s.ckpt
        |             LEFT JOIN db ON db.ckpt = s.ckpt
        |ORDER BY s.ckpt""".stripMargin,
    "q_dedup_yield" ->
      s"""WITH ${LlmQueries.minhashPairsCte},
         |nd AS (SELECT count(*) AS n FROM documents),
         |th AS (SELECT unnest([50, 60, 70, 80, 90]) AS pct),
         |h AS (
         |  SELECT pct, count(*) AS n_pairs,
         |         count(DISTINCT doc_b) AS n_removed
         |  FROM th, j WHERE j.jaccard >= pct / 100.0 GROUP BY pct)
         |SELECT th.pct, coalesce(n_pairs, 0) AS n_pairs,
         |       coalesce(n_removed, 0) AS n_removed,
         |       n - coalesce(n_removed, 0) AS n_kept
         |FROM th CROSS JOIN nd LEFT JOIN h ON h.pct = th.pct
         |ORDER BY th.pct""".stripMargin,
    "q_session_stats" ->
      s"""WITH t AS (
         |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us
         |  FROM events),
         |f AS (
         |  SELECT user_id, event_id, event_type, us,
         |         CASE WHEN lag(us) OVER (PARTITION BY user_id
         |                                 ORDER BY us, event_id) IS NULL
         |               OR us - lag(us) OVER (PARTITION BY user_id
         |                                     ORDER BY us, event_id)
         |                  > $SessionGapUs
         |              THEN 1 ELSE 0 END AS nw
         |  FROM t),
         |s AS (
         |  SELECT *, cast(sum(nw) OVER (PARTITION BY user_id
         |      ORDER BY us, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    AS bigint) AS sid
         |  FROM f),
         |agg AS (
         |  SELECT user_id, sid, count(*) AS n, min(us) AS t0,
         |         max(us) AS t1
         |  FROM s GROUP BY 1, 2),
         |ent AS (
         |  SELECT user_id, sid, event_type FROM s
         |  QUALIFY row_number() OVER (PARTITION BY user_id, sid
         |                             ORDER BY us, event_id) = 1),
         |rep AS (
         |  SELECT e.event_type AS entry_type, count(*) AS n_sessions,
         |         cast(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS bigint)
         |           AS n_bounce,
         |         cast(sum(n) AS bigint) AS ne,
         |         cast(sum(t1 - t0) AS bigint) AS sd,
         |         max(t1 - t0) AS max_duration_us
         |  FROM agg a JOIN ent e USING (user_id, sid) GROUP BY 1)
         |SELECT entry_type, n_sessions, n_bounce,
         |       n_bounce * 1000000 // n_sessions AS bounce_micro,
         |       ne * 1000000 // n_sessions AS avg_events_micro,
         |       sd // n_sessions AS avg_duration_us, max_duration_us
         |FROM rep ORDER BY entry_type""".stripMargin,
    "q_convert_delay" ->
      """WITH per AS (
        |  SELECT user_id,
        |         min(CASE WHEN event_type = 'view'
        |                  THEN epoch_us(ts) END) AS v,
        |         min(CASE WHEN event_type = 'purchase'
        |                  THEN epoch_us(ts) END) AS p
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |  GROUP BY 1),
        |vw AS (
        |  SELECT cast(sum(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END)
        |              AS bigint) AS n_viewers
        |  FROM per),
        |d AS (
        |  SELECT p - v AS delay FROM per
        |  WHERE v IS NOT NULL AND p IS NOT NULL AND p > v),
        |r AS (
        |  SELECT delay, cast(row_number() OVER (ORDER BY delay)
        |                     AS bigint) AS rk
        |  FROM d),
        |n AS (SELECT count(*) AS n_converted FROM d)
        |SELECT n_viewers, n_converted,
        |       n_converted * 1000000 // n_viewers AS cvr_micro,
        |       min(CASE WHEN rk = (25 * n_converted + 99) // 100
        |                THEN delay END) AS p25_us,
        |       min(CASE WHEN rk = (50 * n_converted + 99) // 100
        |                THEN delay END) AS p50_us,
        |       min(CASE WHEN rk = (75 * n_converted + 99) // 100
        |                THEN delay END) AS p75_us,
        |       min(CASE WHEN rk = (90 * n_converted + 99) // 100
        |                THEN delay END) AS p90_us
        |FROM r CROSS JOIN n CROSS JOIN vw
        |GROUP BY n_viewers, n_converted""".stripMargin,
    "q_markov_stationary" -> {
      val iters = (1 to 3).map { i =>
        s"""s$i AS (
           |  SELECT tt AS event_type,
           |         cast(sum(pi * p) AS bigint) // 1000000 AS pi
           |  FROM pi${i - 1} JOIN m ON m.f = pi${i - 1}.event_type
           |  GROUP BY 1),
           |pi$i AS (
           |  SELECT sp.event_type, coalesce(s$i.pi, 0) AS pi
           |  FROM spine sp LEFT JOIN s$i USING (event_type))""".stripMargin
      }.mkString(",\n")
      s"""WITH t AS (
         |  SELECT event_type,
         |         lead(event_type, 1) OVER (PARTITION BY user_id
         |                                   ORDER BY event_id) AS nxt
         |  FROM events),
         |m0 AS (
         |  SELECT event_type AS f, nxt AS tt, count(*) AS n
         |  FROM t WHERE nxt IS NOT NULL GROUP BY 1, 2),
         |m AS (
         |  SELECT f, tt,
         |         n * 1000000
         |           // cast(sum(n) OVER (PARTITION BY f) AS bigint) AS p
         |  FROM m0),
         |spine AS (SELECT DISTINCT f AS event_type FROM m),
         |k AS (SELECT count(*) AS kk FROM spine),
         |pi0 AS (SELECT event_type, 1000000 // kk AS pi FROM spine, k),
         |$iters
         |SELECT sp.event_type, pi0.pi AS pi0_micro, pi1.pi AS pi1_micro,
         |       pi2.pi AS pi2_micro, pi3.pi AS pi3_micro
         |FROM spine sp JOIN pi0 USING (event_type)
         |     JOIN pi1 USING (event_type) JOIN pi2 USING (event_type)
         |     JOIN pi3 USING (event_type)
         |ORDER BY sp.event_type""".stripMargin
    },
    "q_bootstrap_ci" -> {
      val duckShift = (e: String, n: Int) => s"($e >> $n)"
      val hs = (0 until BootB / 2).map { j =>
        s"${LlmQueries.h60Duck(
          s"concat(cast(event_id AS varchar), ':b$j')")} AS h$j"
      }.mkString(",\n       ")
      val ws = (0 until BootB).map { b =>
        s"${bootWeight(s"h${b % (BootB / 2)}",
          if (b < BootB / 2) 0 else 24, duckShift)} AS w$b"
      }.mkString(",\n       ")
      val sums = (0 until BootB).map(b =>
        s"cast(sum(w$b * vm) AS bigint) AS sv$b, " +
          s"cast(sum(w$b) AS bigint) AS sw$b").mkString(",\n       ")
      val arms = (0 until BootB).map(b =>
        s"SELECT n, mean_micro, CASE WHEN sw$b = 0 THEN NULL " +
          s"ELSE sv$b // sw$b END AS m FROM m").mkString("\n  UNION ALL\n  ")
      s"""WITH t AS (
         |  SELECT event_id, cast(round(value * 1000000) AS bigint) AS vm
         |  FROM events),
         |hh AS (
         |  SELECT vm,
         |       $hs
         |  FROM t),
         |w AS (
         |  SELECT vm,
         |       $ws
         |  FROM hh),
         |m AS (
         |  SELECT count(*) AS n,
         |       cast(sum(vm) AS bigint) // count(*) AS mean_micro,
         |       $sums
         |  FROM w),
         |reps AS (
         |  $arms),
         |r AS (
         |  SELECT n, mean_micro, m,
         |         row_number() OVER (ORDER BY m NULLS LAST) AS rk
         |  FROM reps)
         |SELECT n, mean_micro,
         |       min(CASE WHEN rk = 2 THEN m END) AS boot_lo_micro,
         |       min(CASE WHEN rk = ${BootB - 1} THEN m END)
         |         AS boot_hi_micro,
         |       min(CASE WHEN rk = ${BootB - 1} THEN m END)
         |         - min(CASE WHEN rk = 2 THEN m END) AS spread_micro
         |FROM r GROUP BY n, mean_micro""".stripMargin
    },
    "q_neyman_alloc" ->
      s"""WITH t AS (
         |  SELECT event_type, cast(round(value * 1000000) AS bigint) AS vm
         |  FROM events),
         |m AS (
         |  SELECT event_type, count(*) AS n,
         |         cast(sum(vm) AS bigint) AS sx,
         |         sum(cast(vm AS hugeint) * vm) AS sxx
         |  FROM t GROUP BY 1 HAVING count(*) > 1),
         |sdd AS (
         |  SELECT event_type, n,
         |         ${sdFormula("n", "sx", "sxx")} AS sd
         |  FROM m),
         |w AS (
         |  SELECT event_type, n, cast(round(sd) AS bigint) AS sd_micro,
         |         cast(round(cast(n AS double) * sd) AS bigint) AS w0
         |  FROM sdd),
         |tot AS (
         |  SELECT cast(sum(w0) AS bigint) AS tw,
         |         cast(sum(n) AS bigint) AS tn
         |  FROM w),
         |j AS (
         |  SELECT event_type, n, sd_micro,
         |         CASE WHEN tw = 0 THEN n ELSE w0 END AS weight,
         |         CASE WHEN tw = 0 THEN tn ELSE tw END AS den
         |  FROM w, tot),
         |b AS (
         |  SELECT event_type, n, sd_micro, weight,
         |         $NeymanBudget * weight // den AS base,
         |         $NeymanBudget * weight % den AS rem
         |  FROM j),
         |r AS (
         |  SELECT *, cast(row_number() OVER (ORDER BY rem DESC, event_type)
         |                 AS bigint) AS rn,
         |         $NeymanBudget - cast(sum(base) OVER () AS bigint) AS lft
         |  FROM b)
         |SELECT event_type, n, sd_micro, weight,
         |       base + CASE WHEN rn <= lft THEN 1 ELSE 0 END AS alloc
         |FROM r ORDER BY event_type""".stripMargin,
    "q_hour_profile" ->
      """WITH c AS (
        |  SELECT event_type, cast(isodow(ts::DATE) AS integer) AS dow,
        |         cast(hour(ts) AS integer) AS hour,
        |         count(*) AS n,
        |         cast(sum(cast(round(value * 1000000) AS bigint))
        |              AS bigint) AS value_micro
        |  FROM events GROUP BY 1, 2, 3),
        |tot AS (
        |  SELECT event_type, cast(sum(value_micro) AS bigint) AS tv
        |  FROM c GROUP BY 1)
        |SELECT event_type, dow, hour, n, value_micro,
        |       value_micro * 1000000 // tv AS share_micro
        |FROM c JOIN tot USING (event_type)
        |ORDER BY event_type, dow, hour""".stripMargin,
    "q_lorenz" ->
      """WITH t AS (
        |  SELECT event_type, cast(round(value * 1000000) AS bigint) AS vm
        |  FROM events WHERE round(value * 1000000) > 0),
        |r AS (
        |  SELECT event_type, vm,
        |         cast(row_number() OVER (PARTITION BY event_type
        |                                 ORDER BY vm) AS bigint) AS rk,
        |         cast(sum(vm) OVER (PARTITION BY event_type ORDER BY vm
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS bigint) AS cum
        |  FROM t),
        |tot AS (
        |  SELECT event_type, count(*) AS n, cast(sum(vm) AS bigint) AS tv
        |  FROM t GROUP BY 1),
        |d AS (SELECT unnest(generate_series(1, 10)) AS decile)
        |SELECT r.event_type, decile,
        |       min(cum * 1000000 // tv) AS cum_share_micro
        |FROM r JOIN tot USING (event_type) CROSS JOIN d
        |WHERE rk = (decile * n + 9) // 10
        |GROUP BY 1, 2 ORDER BY r.event_type, decile""".stripMargin)
}
