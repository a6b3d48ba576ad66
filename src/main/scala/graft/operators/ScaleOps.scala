package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  *    rank-counted in-bounds flags for the sketch values (see the method
  *    doc — the check lives in rank space, where the GK guarantee does).
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

  /** The sketch's error contract, checked in RANK space (round-4 fix: the
    * old value-space bounds interpolated exact quantiles at p ± 2/Accuracy
    * — at test scale that interval spans < 1 rank, i.e. both endpoints sit
    * between the SAME two adjacent order statistics, while
    * `approx_percentile` returns an actual data value that legitimately
    * lies at/outside them).
    *
    * Rank check: pass 1 computes the per-group sketch values (the
    * production aggregation — one scan, one hash agg, fixed-size GK state);
    * pass 2 broadcast-joins the tiny sketch table back and counts
    * `value <= approx` (the returned value's maximum rank) and
    * `value < approx` (its minimum rank − 1). A correct sketch satisfies
    *   cnt_le ≥ p·n − tol  and  cnt_lt ≤ p·n + tol,
    * tol = max(2n/Accuracy, 2) ranks — twice the GK guarantee plus slack
    * for the ceil(p·n) target-rank rounding — at ANY n, so the flags are
    * scale-stable where the old bounds were not. Ties are handled: the
    * le/lt pair brackets every rank the returned value occupies.
    *
    * The exact `percentile` ride-alongs (per-group full value buffers) and
    * the second scan are ORACLE SCAFFOLDING ONLY — they exist so DuckDB can
    * hash-check the contract. The production form is the sketch-only
    * single-pass [[graft.api.Graft.approxQuantiles]]. */
  private def qApproxQuantiles(s: SparkSession, d: String): DataFrame = {
    val ps = Seq(0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99")
    val ev = Tables.events(s, d).select(col("event_type"), col("value"))
    // Pass 1 (the production pass): per-group GK sketches, one hash agg.
    val sketchAggs = ps.zipWithIndex.map { case ((p, _), i) =>
      expr(s"approx_percentile(value, $p, $Accuracy)").as(s"approx_p$i")
    }
    val sketch = ev.groupBy(col("event_type"))
      .agg(sketchAggs.head, sketchAggs.tail: _*)
    // Pass 2 (oracle scaffolding): rank-count the sketch values against the
    // contract; the sketch table is one row per group — always broadcast.
    val exactAggs = ps.zipWithIndex.map { case ((p, _), i) =>
      expr(s"round(percentile(value, $p), 6)").as(s"exact_p$i")
    }
    val rankAggs = ps.indices.flatMap { i => Seq(
      count(when(col("value") <= col(s"approx_p$i"), lit(1))).as(s"le$i"),
      count(when(col("value") < col(s"approx_p$i"), lit(1))).as(s"lt$i"))
    }
    val aggs = count(lit(1)).as("n") +: (exactAggs ++ rankAggs)
    def inBounds(i: Int, p: Double) = {
      val tol = greatest(col("n") * (2.0 / Accuracy), lit(2.0))
      (col(s"le$i") >= col("n") * p - tol) &&
        (col(s"lt$i") <= col("n") * p + tol)
    }
    ev.join(broadcast(sketch), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(aggs.head, aggs.tail: _*)
      .select(Seq(col("event_type"), col("n"),
        col("exact_p0"), col("exact_p1"), col("exact_p2")) ++
        ps.zipWithIndex.map { case ((p, nm), i) =>
          inBounds(i, p).as(s"${nm}_in_bounds")
        }: _*)
      .orderBy(col("event_type"))
  }

  /** Per-group anomaly detection: each value z-scored against its own
    * group's mean/σ, top-`k` most anomalous per group — the metric-stream
    * outlier gate (bad-batch detection, sensor spikes, data-quality
    * monitors). Cross-engine determinism: values quantize to exact
    * 1e-3-unit integers, so count/sum/sum-of-squares are EXACT integer
    * aggregates (partitioning cannot move them — double summation order
    * would); mean/σ/z then derive through identical scalar IEEE double
    * ops in both engines, and ranking uses z rounded at 6 dp. Shape: one
    * hash agg for the bounded per-group moments, one broadcast back, a
    * per-group top-k window WindowGroupLimit prunes — the value column
    * shuffles once, as integer partials. */
  private[graft] def zscoreOutliers(events: DataFrame, groupCol: String,
      idCol: String, valCol: String, k: Int): DataFrame = {
    val q = events.select(col(groupCol), col(idCol), col(valCol),
      expr(s"cast(round($valCol * 1000.0) AS bigint)").as("_q"))
    // Moments in exact integer units: _q ≤ ~5e5 per row here, so the
    // square sum stays far from 2^63 for any realistic group (~1e16 rows
    // would be needed to overflow). The double casts happen AFTER the
    // exact sums, so the only inexact steps are order-independent
    // scalar ops.
    val stats = q.groupBy(col(groupCol)).agg(
      count(lit(1)).cast("double").as("_n"),
      sum(col("_q")).cast("double").as("_s1"),
      sum(expr("_q * _q")).cast("double").as("_s2"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(abs(col("z")).desc, col(idCol))
    // σ = 0 guard: a constant-valued group has s2·n == s1², and the raw
    // formula is 0/0 → NaN, whose ordering differs across engines. Every
    // member of such a group is exactly its mean, so z = 0 by definition.
    // The guard compares doubles, but both factors derive from EXACT
    // integer sums cast once — identical bit patterns in both engines.
    q.join(broadcast(stats), Seq(groupCol))
      .withColumn("z",
        when(col("_s2") * col("_n") === col("_s1") * col("_s1"), lit(0.0))
          .otherwise(round(
            (col("_q") - col("_s1") / col("_n")) /
              sqrt((col("_s2") - col("_s1") * col("_s1") / col("_n")) / col("_n")), 6)))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(groupCol), col("rk"), col(idCol), col(valCol), col("z"))
  }

  private def qZscoreOutliers(s: SparkSession, d: String): DataFrame =
    zscoreOutliers(Tables.events(s, d), "event_type", "event_id", "value",
      k = 5)
      .orderBy(col("event_type"), col("rk"))

  /** Exact distributed heavy hitters (r9): keys whose count exceeds
    * N/`supportDenom`, computed WITHOUT shuffling the full key space.
    *
    * Phase 1 runs Misra-Gries with `supportDenom` counters inside each
    * partition (the one other justified `mapPartitions` beside the
    * multimodal codec kernel: C-counter sketch state is genuinely
    * per-partition imperative). Superset guarantee by pigeonhole: if a
    * key's count_p ≤ n_p/C in EVERY partition, its global count is
    * ≤ N/C — so every true heavy hitter survives phase 1 somewhere,
    * regardless of partitioning. Phase 2 recounts ONLY the candidates
    * (broadcast semi-join, map-side) and filters by the exact global
    * threshold (1-row count broadcast, in-plan) — so the output is EXACT
    * and deterministic even though the candidate set isn't.
    *
    * Scale shape: the shuffle carries ≤ partitions × C candidate
    * partials, not the distinct-key space — on a 100 TB long-tail key
    * column (urls, user agents, n-grams) that is the difference between
    * a bounded agg and shuffling the tail. */
  private[graft] def heavyHitters(df: DataFrame, keyCol: String,
      supportDenom: Int): DataFrame = {
    require(supportDenom >= 2, s"supportDenom must be >= 2, got $supportDenom")
    val s = df.sparkSession
    import s.implicits._
    // NULL keys (including values the long cast turns into NULL) are
    // COUNTED, not crashed on: a null-ish hot key is a classic skew
    // source (the funnel guard's motivating case), and a bare as[Long]
    // would throw a deserialization error on the first NULL. Nulls ride
    // the sketch as a Long.MinValue sentinel and emerge as NULL again in
    // the output (a real Long.MinValue key would collide — document-level
    // caveat, it is not a plausible id).
    val keyed = df.select(coalesce(col(keyCol).cast("long"),
      lit(Long.MinValue)).as("k"))
    val cands = keyed.as[Long].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[Long, Long]
      it.foreach { k =>
        counters.get(k) match {
          case Some(c) => counters(k) = c + 1
          case None if counters.size < supportDenom => counters(k) = 1L
          case None => // decrement-all; drop exhausted counters
            counters.keysIterator.toArray.foreach { k2 =>
              val c = counters(k2) - 1
              if (c == 0L) counters.remove(k2) else counters(k2) = c
            }
        }
      }
      counters.keysIterator
    }.toDF("k").distinct()
    val tot = keyed.agg(count(lit(1)).as("_n"))
    keyed.join(broadcast(cands), Seq("k"), "left_semi")
      .groupBy(col("k")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(tot))
      .filter(col("cnt") * supportDenom > col("_n"))
      .select(when(col("k") === Long.MinValue, lit(null).cast("long"))
        .otherwise(col("k")).as("k"), col("cnt"))
  }

  /** Build-once bucketed copies of `orders`/`customer` for
    * [[qBucketedJoin]], both clustered AND sorted by their join key into
    * the same bucket count — Spark's on-disk hash-partitioning contract.
    * Registered in the session catalog per JVM ([[PersistedVectorIndex]]'s
    * serial-harness assumption); the parquet lands under the JVM tmp dir.
    * The first call in a JVM pays the write (covered by the bench's
    * warm-up pass, like the vector-index fixture); every later call reads
    * the bucketed layout for free. */
  private[graft] object BucketedTables {
    val NumBuckets = 8
    def ensure(s: SparkSession, d: String): (String, String) = synchronized {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val root = s"${sys.props("java.io.tmpdir")}/graft_bucketed/$tag"
      val ot = s"graft_orders_bkt_$tag"
      val ct = s"graft_customer_bkt_$tag"
      if (!s.catalog.tableExists(ot)) {
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .write.bucketBy(NumBuckets, "o_custkey").sortBy("o_custkey")
          .mode("overwrite").option("path", s"$root/orders").saveAsTable(ot)
      }
      if (!s.catalog.tableExists(ct)) {
        Tables.customer(s, d)
          .select(col("c_custkey"), col("c_name"))
          .write.bucketBy(NumBuckets, "c_custkey").sortBy("c_custkey")
          .mode("overwrite").option("path", s"$root/customer").saveAsTable(ct)
      }
      (ot, ct)
    }
  }

  /** CO-LOCATED join via bucketing (r9): both sides pre-hashed to the
    * same bucket layout on their join key, so the fact⋈dim join AND the
    * downstream per-customer aggregation run with ZERO exchanges — the
    * plan reads bucket i of each table side by side and never moves a
    * row (plan-pinned). At 100 TB this is the difference between a
    * nightly pipeline that reshuffles the fact table on every join and
    * one that wrote it bucketed once: every subsequent join/agg on the
    * bucket key is shuffle-free, which is why warehouses bucket their
    * biggest fact tables. The aggregation stays exchange-free because
    * HashPartitioning(custkey) satisfies the (custkey, name) clustering
    * — grouping keys are a superset of the partitioning key. */
  private def qBucketedJoin(s: SparkSession, d: String): DataFrame = {
    val (ot, ct) = BucketedTables.ensure(s, d)
    // hint("merge") pins the sort-merge strategy the bucketed layout
    // exists to serve — at this test scale AQE would broadcast the dim
    // and the demo would measure nothing (the q_skew_salted_join
    // discipline); at 100 TB BOTH sides are too big to broadcast and
    // merge is what the planner picks anyway.
    val o = s.table(ot).hint("merge")
    val c = s.table(ct)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("o_custkey"), col("c_name"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"))
      .orderBy(col("o_custkey"))
  }

  /** Demo distribution for [[heavyHitters]], derived in-plan so it is
    * identical in both engines at every SF (the [[qSkewSaltedJoin]]
    * pattern): 3/4 of events fold onto 8 hot keys (~9.4% share each),
    * the rest keep their unique event_id — the hot-head + long-tail
    * shape heavy hitters exist for. The uniform synthetic tables have
    * no native stable skew (user share shrinks as cardinality grows
    * with SF), so the demo manufactures it deterministically. */
  private def qHeavyHitters(s: SparkSession, d: String): DataFrame =
    heavyHitters(
      Tables.events(s, d).select(
        when(pmod(col("event_id"), lit(4)) =!= 0, pmod(col("event_id"), lit(8)))
          .otherwise(col("event_id")).as("k")),
      "k", supportDenom = 100)
      .orderBy(col("cnt").desc, col("k"))

  /** Population-stability-index drift monitor (r10): how far each
    * segment's value distribution sits from the whole corpus's, as the
    * standard PSI score `Σ_b (p_seg,b − p_all,b) · ln(p_seg,b / p_all,b)`
    * over `nBuckets` fixed histogram buckets — the number a data-quality
    * gate alerts on when one source/shard/day of a 100 TB feed starts
    * looking unlike the rest (industry rule of thumb: < 0.1 stable,
    * > 0.25 drifted).
    *
    * Scale shape: ONE real shuffle — the (segment, bucket) count
    * aggregate, whose map-side partials bound the exchange at
    * |segments| × nBuckets rows per map partition regardless of input
    * size. Everything downstream (the dense segment × bucket grid, the
    * per-segment / per-bucket / global windowed totals, the PSI fold)
    * runs on that |segments| × nBuckets-row table. The counts are
    * [[Materialize]]d once because the grid derives its segment list
    * from them — without the barrier the segment-distinct branch would
    * rescan the input.
    *
    * Determinism: probabilities are Laplace-smoothed exact-integer
    * ratios ((c+1)/(n+nBuckets) — smoothing also keeps ln's argument
    * nonzero for empty buckets), each PSI term is quantized to integer
    * NANO-nats before the sum (the q_lm_score micro-nat rule: integer
    * addition is associative, so partitioning can't move the result; a
    * term must land within ~1 ulp of a 0.5-nano boundary for the two
    * engines' faithfully-rounded `ln` to disagree). */
  private[graft] def driftPsi(rows: DataFrame, segmentCol: String,
      bucketCol: String, nBuckets: Int): DataFrame =
    driftPsiFromCounts(
      Materialize(rows
        .groupBy(col(segmentCol).as("seg"), col(bucketCol).cast("long").as("b"))
        .agg(count(lit(1)).as("c"))),
      nBuckets)

  /** The PSI tail over an ALREADY-AGGREGATED (seg, b, c) count grid — the
    * seam that lets a maintained histogram (the streaming `s_drift` MV)
    * feed the same windowed-totals + nano-nat fold as the in-plan batch
    * form; `cnt` must be materialized / re-readable (the grid derives its
    * segment list from it). */
  private[graft] def driftPsiFromCounts(cnt: DataFrame,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val grid = cnt.select(col("seg")).distinct()
      .crossJoin(cnt.sparkSession.range(nBuckets).select(col("id").as("b")))
    val w = grid.join(cnt, Seq("seg", "b"), "left")
      .select(col("seg"), col("b"), coalesce(col("c"), lit(0L)).as("c"))
      .withColumn("n_seg", sum(col("c")).over(Window.partitionBy(col("seg"))))
      .withColumn("c_all", sum(col("c")).over(Window.partitionBy(col("b"))))
      .withColumn("n", sum(col("c")).over(Window.partitionBy()))
    w.withColumn("pc", expr(s"cast(c + 1 as double) / cast(n_seg + $nBuckets as double)"))
      .withColumn("pr", expr(s"cast(c_all + 1 as double) / cast(n + $nBuckets as double)"))
      // 1e9, not 1000000000.0: Spark SQL parses a dotted literal as
      // DECIMAL, which would silently turn psi into a decimal column
      // (the no-decimal-outputs oracle rule); 1e9 is a double literal.
      .withColumn("t_nano", expr(
        "cast(round((pc - pr) * ln(pc / pr) * 1e9) as bigint)"))
      .groupBy(col("seg"))
      .agg(max(col("n_seg")).as("n_events"),
        expr("round(cast(sum(t_nano) as double) / 1e9, 6)").as("psi"))
  }

  /** Driver binding of [[driftPsi]]: per-event-type drift of the `value`
    * distribution against the whole events table, over 10 fixed-width
    * buckets derived in exact integer cents (`round(value·100) div 5000`,
    * capped at bucket 9 — the q_zscore_outliers quantization rule, so
    * bucketing is bit-identical across engines). */
  private def qDriftPsi(s: SparkSession, d: String): DataFrame =
    driftPsi(
      Tables.events(s, d).select(col("event_type").as("seg"),
        expr("least(cast(9 as bigint), cast(round(value * 100) as bigint) div 5000)")
          .as("vb")),
      "seg", "vb", nBuckets = 10)
      .select(col("seg").as("event_type"), col("n_events"), col("psi"))
      .orderBy(col("event_type"))

  /** Robust (median/MAD) outlier gate (r11): the top-5 values per group
    * by robust z-score `0.6745·(v − median) / MAD` — the
    * breakdown-resistant twin of [[qZscoreOutliers]]. Mean/σ move with
    * the outliers they are supposed to flag (one 1000× bad batch drags
    * the mean toward itself and masks its neighbors — the masking
    * effect); the median and the median-absolute-deviation have a 50%
    * breakdown point, so the gate still fires when half the batch is
    * garbage. 0.6745 ≈ Φ⁻¹(3/4) rescales MAD to σ under normality, so
    * thresholds transfer from the z-score world.
    *
    * Determinism without quantized moments: values quantize to exact
    * 1e-6-unit integers FIRST, so every percentile interpolation runs on
    * exact doubles (midpoints of integers are exact multiples of 0.5 —
    * `a + 0.5·(b−a)` and `(a+b)/2` are the SAME double, engine
    * interpolation formula differences can't surface) and the deviation
    * |v − med| stays exact; the one rounding is the 6-dp output edge.
    *
    * 100 TB shape: two bounded hash aggregations (median, then MAD over
    * the deviations — exact percentile state is per-group sort-based
    * here; at scale swap `approx_percentile`, same frame), each result
    * broadcast back onto the scan, and a per-group top-5 window
    * (WindowGroupLimit prunes to 5 per partition pre-exchange). Groups
    * with MAD = 0 (over half the group identical) drop — declared
    * semantics, oracle-replicated. */
  private def qMadOutliers(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_type"), col("event_id"), col("value"))
      .withColumn("vm", expr("cast(round(value * 1000000) AS bigint)"))
    val med = ev.groupBy(col("event_type"))
      .agg(expr("percentile(vm, 0.5)").as("med"))
    val dev = ev.join(broadcast(med), Seq("event_type"))
    val mad = dev.groupBy(col("event_type"))
      .agg(expr("percentile(abs(vm - med), 0.5)").as("mad"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(expr("abs(0.6745 * (vm - med) / mad)").desc, col("event_id"))
    dev.join(broadcast(mad), Seq("event_type"))
      .filter(col("mad") > 0)
      .withColumn("rz", expr("round(0.6745 * (vm - med) / mad, 6)"))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= 5)
      .select(col("event_type"), col("event_id"), col("value"), col("rz"))
      .orderBy(col("event_type"), col("event_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mad_outliers" -> qMadOutliers _,
    "q_skew_salted_join" -> qSkewSaltedJoin _,
    "q_approx_distinct" -> qApproxDistinct _,
    "q_approx_quantiles" -> qApproxQuantiles _,
    "q_zscore_outliers" -> qZscoreOutliers _,
    "q_heavy_hitters" -> qHeavyHitters _,
    "q_bucketed_join" -> qBucketedJoin _,
    "q_drift_psi" -> qDriftPsi _
  )

  /** Shared by `q_drift_psi` AND the streaming `s_drift`
    * ([[graft.streaming.DriftStream]]): the streaming claim is that the
    * stream-maintained histogram reproduces the batch PSI exactly (the
    * IVM invariant, monitoring edition) — one oracle string, zero drift. */
  private[graft] val driftPsiOracle: String =
    """WITH q AS (SELECT event_type AS seg,
      |                  least(CAST(9 AS bigint),
      |                        CAST(round(value * 100) AS bigint) // 5000) AS b
      |           FROM events),
      |cnt AS (SELECT seg, b, count(*) AS c FROM q GROUP BY seg, b),
      |grid AS (SELECT s.seg, g.range AS b
      |         FROM (SELECT DISTINCT seg FROM cnt) s, range(10) g),
      |f AS (SELECT g.seg, g.b, coalesce(c.c, 0) AS c
      |      FROM grid g LEFT JOIN cnt c ON g.seg = c.seg AND g.b = c.b),
      |w AS (SELECT seg, b, c,
      |             sum(c) OVER (PARTITION BY seg) AS n_seg,
      |             sum(c) OVER (PARTITION BY b) AS c_all,
      |             sum(c) OVER () AS n
      |      FROM f),
      |t AS (SELECT seg, n_seg,
      |             CAST(round((CAST(c + 1 AS double) / CAST(n_seg + 10 AS double)
      |                         - CAST(c_all + 1 AS double) / CAST(n + 10 AS double))
      |                        * ln((CAST(c + 1 AS double) / CAST(n_seg + 10 AS double))
      |                             / (CAST(c_all + 1 AS double) / CAST(n + 10 AS double)))
      |                        * 1000000000.0) AS bigint) AS t_nano
      |      FROM w)
      |SELECT seg AS event_type, CAST(max(n_seg) AS bigint) AS n_events,
      |       round(sum(t_nano) / 1000000000.0, 6) AS psi
      |FROM t GROUP BY seg
      |ORDER BY event_type""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_mad_outliers" ->
      """WITH ev AS (
        |  SELECT event_type, event_id, value,
        |         cast(round(value * 1000000) AS bigint) AS vm
        |  FROM events),
        |med AS (SELECT event_type, quantile_cont(vm, 0.5) AS med
        |        FROM ev GROUP BY 1),
        |dev AS (SELECT ev.*, med FROM ev JOIN med USING (event_type)),
        |mad AS (SELECT event_type, quantile_cont(abs(vm - med), 0.5) AS mad
        |        FROM dev GROUP BY 1),
        |sc AS (
        |  SELECT dev.event_type, event_id, value,
        |         round(0.6745 * (vm - med) / mad, 6) AS rz,
        |         0.6745 * (vm - med) / mad AS rz_raw
        |  FROM dev JOIN mad USING (event_type)
        |  WHERE mad > 0)
        |SELECT event_type, event_id, value, rz
        |FROM sc
        |QUALIFY row_number() OVER (PARTITION BY event_type
        |                           ORDER BY abs(rz_raw) DESC, event_id) <= 5
        |ORDER BY event_type, event_id""".stripMargin,
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
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // Bucketing is physical, not semantic: the oracle is the plain join.
    "q_bucketed_join" ->
      """SELECT o_custkey, c_name, count(*) AS n_orders,
        |       cast(sum(cast(o_totalprice AS decimal(18,2))) AS double)
        |         AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY o_custkey, c_name
        |ORDER BY o_custkey""".stripMargin,
    // Heavy hitters: the MG phase is invisible to the oracle — it only
    // prunes candidates; the exact recount + threshold IS the semantics.
    "q_heavy_hitters" ->
      """WITH keyed AS (
        |  SELECT CASE WHEN event_id % 4 <> 0 THEN event_id % 8
        |              ELSE event_id END AS k
        |  FROM events),
        |tot AS (SELECT count(*) AS n FROM keyed)
        |SELECT k, count(*) AS cnt
        |FROM keyed, tot GROUP BY k, n
        |HAVING count(*) * 100 > n
        |ORDER BY cnt DESC, k""".stripMargin,
    // PSI drift: Laplace-smoothed exact-integer probabilities, each term
    // quantized to integer nano-nats before the (associative) sum — the
    // oracle replicates the arithmetic literally, so a bucketing or
    // smoothing drift in either engine breaks the hash.
    "q_drift_psi" -> driftPsiOracle,
    "q_zscore_outliers" ->
      """WITH q AS (SELECT event_type, event_id, value,
        |                  cast(round(value * 1000.0) AS bigint) AS qv
        |           FROM events),
        |st AS (SELECT event_type,
        |              cast(count(*) AS double) AS n,
        |              cast(sum(qv) AS double) AS s1,
        |              cast(sum(qv * qv) AS double) AS s2
        |       FROM q GROUP BY event_type),
        |z AS (SELECT q.event_type, q.event_id, q.value,
        |             CASE WHEN s2 * n = s1 * s1 THEN 0.0
        |                  ELSE round((qv - s1 / n) / sqrt((s2 - s1 * s1 / n) / n), 6)
        |             END AS z
        |      FROM q JOIN st USING (event_type))
        |SELECT event_type,
        |       cast(row_number() OVER (PARTITION BY event_type
        |                               ORDER BY abs(z) DESC, event_id) AS int) AS rk,
        |       event_id, value, z
        |FROM z QUALIFY rk <= 5
        |ORDER BY event_type, rk""".stripMargin
  )
}
