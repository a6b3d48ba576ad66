package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-statistics signals for training-data curation: collocation
  * mining (PMI), tokenizer-vocabulary coverage, and per-document token
  * entropy. All three are standard pre-training corpus diagnostics — PMI
  * surfaces multi-word expressions worth protecting from tokenizer
  * splits, coverage quantifies what a top-K vocab actually captures, and
  * entropy is the cheap "is this text degenerate" quality gate beside
  * repetition and LM scores.
  *
  * House determinism rules throughout: every `ln` quantizes to integer
  * micro-nats before any sum (the q_lm_score convention — long addition
  * is associative, so partitioning can't move a micro-nat), ties break
  * on the token text, and no double ever rides an aggregation.
  */
object TextSignals {

  /** Top-20 bigram collocations by pointwise mutual information,
    * `pmi = ln(c12·N / (c1·c2))`, over space-tokenized documents with a
    * min-support floor of 5 occurrences (PMI is noise below tiny counts).
    *
    * 100 TB shape: exactly the q_lm_score discipline — the corpus
    * collapses to count tables in TWO hash aggregations (unigram,
    * bigram), the bigram table joins its two unigram marginals on
    * co-partitioned gram keys (never broadcast: vocab grows with the
    * corpus), the 1-row total rides a broadcast, and the final top-20 is
    * TakeOrderedAndProject — shuffles carry gram strings and counts,
    * never document text, and nothing scales past the distinct-bigram
    * count. */
  private[graft] def pmiTop(docs: DataFrame, textCol: String,
      minCount: Int, k: Int): DataFrame = {
    val bg = docs
      .selectExpr(s"split($textCol, ' ') AS _toks")
      .filter(expr("size(_toks) >= 2"))
      .selectExpr(
        "explode(transform(sequence(1, size(_toks) - 1), i -> struct(_toks[i-1] AS w1, _toks[i] AS w2))) AS _bg")
      .select(col("_bg.w1").as("w1"), col("_bg.w2").as("w2"))
    val bi = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val uni1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val uni2 = bg.groupBy(col("w2")).agg(count(lit(1)).as("c2"))
    val total = bg.agg(count(lit(1)).as("n_total"))
    bi.filter(col("c12") >= minCount)
      .join(uni1, Seq("w1"))
      .join(uni2, Seq("w2"))
      .crossJoin(broadcast(total))
      .withColumn("pmi_micro",
        expr("cast(round(ln(c12 * cast(n_total AS double) / (c1 * cast(c2 AS double))) * 1000000) AS bigint)"))
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        col("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("w1"), col("w2"))
      .limit(k)
  }

  private def qPmi(s: SparkSession, d: String): DataFrame =
    pmiTop(Tables.spread(s, Tables.documents(s, d)), "text", 5, 20)

  /** Vocabulary coverage: what fraction of all token OCCURRENCES the
    * top-K most frequent types capture, reported at K = 10 / 100 / 1000.
    * The go/no-go number for sizing a tokenizer vocab against a corpus.
    *
    * 100 TB shape: one token-count hash aggregation (the only shuffle
    * that scales with data), a 1-row total, and a TakeOrdered top-maxK —
    * the cumulative sum then runs over ≤ maxK rows, so there is NO
    * global sort and no window wider than the report itself. Ties order
    * by (count desc, token) — a total order, so the cut at each K is
    * deterministic. */
  private[graft] def vocabCoverage(docs: DataFrame, textCol: String,
      ks: Seq[Int]): DataFrame = {
    val maxK = ks.max
    val counts = docs
      .selectExpr(s"explode(split($textCol, ' ')) AS tok")
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("n_total"),
      count(lit(1)).as("n_vocab"))
    val top = counts
      .orderBy(col("cnt").desc, col("tok"))
      .limit(maxK)
      .withColumn("_rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("tok"))))
    val kdf = docs.sparkSession
      .createDataFrame(ks.map(Tuple1(_))).toDF("k")
    kdf.join(top, col("_rank") <= col("k"), "left")
      .groupBy(col("k")).agg(sum(col("cnt")).as("covered"))
      .crossJoin(broadcast(total))
      .select(col("k"),
        least(col("k"), col("n_vocab")).as("vocab_used"),
        col("covered"), col("n_total"),
        expr("covered * 1000000 div n_total").as("coverage_micro"))
      .orderBy(col("k"))
  }

  private def qVocabCoverage(s: SparkSession, d: String): DataFrame =
    vocabCoverage(Tables.spread(s, Tables.documents(s, d)), "text",
      Seq(10, 100, 1000))

  /** Per-document token-level Shannon entropy in micro-nats per token —
    * low entropy = degenerate/templated text (the q_repetition_filter
    * signal from the information-theory side), high = diverse. Each
    * term `cnt·ln(n/cnt)` quantizes to micro-nats BEFORE the per-doc
    * sum, so the fold order over the distinct-token array cannot move
    * the result; the final per-token normalization is integer division.
    *
    * 100 TB shape: pure map-side higher-order algebra — distinct tokens,
    * per-token counts, and the entropy fold all run inside the row; no
    * explode, no shuffle, scan speed (the q_pii_scrub shape). Cost is
    * O(distinct × tokens) per doc, bounded by doc length. */
  private[graft] def tokenEntropy(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs
      .selectExpr(idCol, s"split($textCol, ' ') AS _toks")
      .selectExpr(idCol, "_toks", "size(_toks) AS n_tokens",
        "array_distinct(_toks) AS _d")
      .selectExpr(idCol, "n_tokens", "size(_d) AS n_distinct",
        "aggregate(transform(_d, t -> cast(round(size(filter(_toks, x -> x = t)) * ln(cast(n_tokens AS double) / size(filter(_toks, x -> x = t))) * 1000000) AS bigint)), cast(0 AS bigint), (a, x) -> a + x) AS _ent_sum")
      .selectExpr(idCol, "cast(n_tokens AS bigint) AS n_tokens",
        "cast(n_distinct AS bigint) AS n_distinct",
        "_ent_sum div n_tokens AS entropy_micro")

  private def qEntropy(s: SparkSession, d: String): DataFrame =
    tokenEntropy(Tables.spread(s, Tables.documents(s, d)), "doc_id", "text")
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pmi" -> qPmi _,
    "q_vocab_coverage" -> qVocabCoverage _,
    "q_entropy" -> qEntropy _)

  val oracle: Map[String, String] = Map(
    "q_pmi" ->
      """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents
        |           WHERE len(string_split(text, ' ')) >= 2),
        |b AS (SELECT unnest(list_transform(range(1, len(toks)),
        |               i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS bg
        |      FROM t),
        |bg AS (SELECT bg.w1 AS w1, bg.w2 AS w2 FROM b),
        |bi AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        |u1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
        |u2 AS (SELECT w2, count(*) AS c2 FROM bg GROUP BY 1),
        |tot AS (SELECT count(*) AS n_total FROM bg)
        |SELECT w1, w2, c12, c1, c2,
        |       cast(round(ln(c12 * cast(n_total AS double) / (c1 * cast(c2 AS double))) * 1000000) AS bigint) AS pmi_micro
        |FROM bi JOIN u1 USING (w1) JOIN u2 USING (w2), tot
        |WHERE c12 >= 5
        |ORDER BY pmi_micro DESC, w1, w2 LIMIT 20""".stripMargin,
    "q_vocab_coverage" ->
      """WITH counts AS (
        |  SELECT tok, count(*) AS cnt
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY tok),
        |tot AS (SELECT cast(sum(cnt) AS bigint) AS n_total,
        |               cast(count(*) AS bigint) AS n_vocab FROM counts),
        |top AS (
        |  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS r
        |  FROM counts ORDER BY cnt DESC, tok LIMIT 1000),
        |ks AS (SELECT unnest([10, 100, 1000]) AS k)
        |SELECT cast(k AS integer) AS k, least(k, n_vocab) AS vocab_used,
        |       (SELECT cast(sum(cnt) AS bigint) FROM top WHERE r <= k) AS covered,
        |       n_total,
        |       (SELECT cast(sum(cnt) AS bigint) FROM top WHERE r <= k) * 1000000 // n_total AS coverage_micro
        |FROM ks, tot ORDER BY k""".stripMargin,
    "q_entropy" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |       cast(len(toks) AS bigint) AS n_tokens,
        |       cast(len(list_distinct(toks)) AS bigint) AS n_distinct,
        |       cast(list_sum(list_transform(list_distinct(toks),
        |         t -> cast(round(len(list_filter(toks, x -> x = t)) * ln(cast(len(toks) AS double) / len(list_filter(toks, x -> x = t))) * 1000000) AS bigint))) AS bigint)
        |         // cast(len(toks) AS bigint) AS entropy_micro
        |FROM d ORDER BY doc_id""".stripMargin)
}
