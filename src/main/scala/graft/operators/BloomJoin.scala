package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bloom-filter-pruned join — the shuffle-reduction play for a selective
  * dim⋈fact join whose dim side is too big to broadcast AS KEYS but tiny
  * AS BITS: build a Bloom filter over the build side's join keys (~10
  * bits/key), broadcast the bitmap, and drop probe-side rows map-side
  * BEFORE the join shuffle. False positives are removed by the exact
  * equi-join that follows; false negatives are impossible (same
  * deterministic hashes on both sides), so the operator is
  * result-transparent — which is also why the DuckDB oracle is the plain
  * join.
  *
  * Spark's own runtime bloom filter (`InjectRuntimeFilter`) plays this
  * exact trick when thresholds allow; this is the explicit, always-on
  * form with the bitmap in plan-visible column algebra (portable, and
  * pinned below the exchange by the plan audit).
  *
  * 100 TB shape: the probe side never shuffles a row the build side
  * can't match — for a 1%-selective dim filter that is a ~99% cut of the
  * fact-side exchange, the difference between a day and an hour of
  * shuffle. The bitmap is fixed-size driver metadata (m = 2¹⁶ bits = 8
  * KiB here; size m to keys × 10 bits in production), built by ONE
  * aggregation over the filtered build side.
  */
object BloomJoin {

  private[graft] val M = 65536 // bits (power of two: pmod → mask friendly)
  private[graft] val K = 3     // hash functions

  /** k deterministic bit positions for a key: xxhash64 seeded by the
    * probe index (the standard k-independent-hash construction). */
  private def positions(key: Column): Seq[Column] =
    (0 until K).map(i => pmod(xxhash64(key, lit(i)), lit(M)))

  /** Build the 1-row bitmap frame: `bm` = array of m/64 longs. */
  private[graft] def buildBloom(build: DataFrame, keyCol: String): DataFrame =
    build
      .select(explode(array(positions(col(keyCol)): _*)).as("_p"))
      .groupBy().agg(collect_set(col("_p")).as("_ps"))
      .selectExpr(
        s"transform(sequence(0, ${M / 64 - 1}), w -> aggregate(" +
          "filter(_ps, p -> p div 64 = w), cast(0 AS bigint), " +
          "(acc, p) -> acc | shiftleft(cast(1 AS bigint), cast(p % 64 AS int)))) AS bm")

  /** The probe predicate: every one of the key's k bits is set. Expects
    * the bitmap in scope as a column named `bm`. */
  private[graft] def mightContain(keyCol: String): Column =
    (0 until K).map { i =>
      val p = s"pmod(xxhash64($keyCol, $i), $M)"
      expr(s"(element_at(bm, cast($p div 64 AS int) + 1) & " +
        s"shiftleft(cast(1 AS bigint), cast($p % 64 AS int))) != 0")
    }.reduce(_ && _)

  /** Bloom-prune `probe` to rows whose `probeKey` might appear in
    * `build`'s `buildKey` — map-side, before any join shuffle. The ONE
    * implementation behind the driver query and
    * [[graft.api.Graft.bloomPrune]]. */
  private[graft] def bloomPrune(probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String): DataFrame =
    probe.crossJoin(broadcast(buildBloom(build, buildKey)))
      .filter(mightContain(probeKey))
      .drop("bm")

  /** Driver binding: revenue per supplier of ONE nation. The supplier
    * filter is ~4% selective, so ~96% of lineitem rows drop at the scan
    * instead of riding the join exchange. The join itself is hinted
    * shuffle-merge — the honest 100 TB shape where the dim is too big to
    * broadcast (a broadcast join would make the bloom redundant and hide
    * what it buys). Revenue quantizes each line to integer micros before
    * the associative long sum (house determinism rule). */
  private def qBloomJoin(s: SparkSession, d: String): DataFrame = {
    val supp = Tables.supplier(s, d)
      .filter(col("s_nationkey") === 7)
      .select(col("s_suppkey"), col("s_name"))
    val pruned = bloomPrune(Tables.lineitem(s, d)
        .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount")),
      "l_suppkey", supp, "s_suppkey")
    pruned
      .join(supp.hint("SHUFFLE_MERGE"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("n_lines"),
        sum(expr(
          "cast(round(l_extendedprice * (1.0 - l_discount) * 1000000) AS bigint)"))
          .as("revenue_micro"))
      .orderBy(col("s_suppkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bloom_join" -> qBloomJoin _)

  val oracle: Map[String, String] = Map(
    // The bloom is result-transparent (no false negatives; false
    // positives die in the exact join) — the oracle is the plain join.
    "q_bloom_join" ->
      """SELECT s_suppkey, s_name, count(*) AS n_lines,
        |       cast(sum(cast(round(l_extendedprice * (1.0 - l_discount) * 1000000) AS bigint)) AS bigint) AS revenue_micro
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |WHERE s_nationkey = 7
        |GROUP BY s_suppkey, s_name
        |ORDER BY s_suppkey""".stripMargin)
}
