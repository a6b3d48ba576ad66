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

  /** DSIR-style importance weighting for domain-targeted data selection
    * (r11): each document scored by how much more likely its bigrams are
    * under a TARGET-domain LM than under the whole-corpus LM — the
    * published importance-resampling recipe for pulling target-like data
    * out of a general crawl (hashed-n-gram importance weights; here the
    * demo target is the `lang = 'en'` subset). Positive = target-like,
    * negative = corpus-typical-but-not-target; resampling keeps docs
    * proportionally to the weight. The corpus-relative third leg of the
    * quality family: `q_quality_score` (fixed heuristics), `q_lm_score`
    * (corpus-typicality), this (target-domain affinity).
    *
    * The load-bearing trick: BOTH LMs come out of the SAME two count
    * aggregations — the target counts are conditional sums riding next
    * to the corpus counts, so adding the second LM costs zero extra
    * passes and zero extra joins. Add-one smoothing over the shared
    * corpus vocabulary keeps unseen target bigrams finite.
    *
    * Determinism: each bigram's two log-probs quantize to integer
    * micro-nats BEFORE the difference and the per-doc sum (the q_lm_score
    * rule); the per-bigram average is the one double division at the
    * output edge, rounded to 6 dp (integer `div` would floor-vs-truncate
    * differently across engines on negative sums).
    *
    * 100 TB shape: identical to q_lm_score — two hash aggregations build
    * the count tables, the score joins back on co-partitioned gram keys
    * (never broadcast; the bigram table grows with the corpus), only the
    * 1-row vocab size broadcasts, and shuffles carry (doc_id, w1, w2)
    * gram rows, never document text. Scoring against a FROZEN target LM
    * (the production form: train once on the curated target set, score
    * every crawl batch) is this plan minus the training aggregations. */
  private[graft] def dsirWeights(docs: DataFrame, idCol: String,
      textCol: String, targetPred: String): DataFrame = {
    val b = docs
      .selectExpr(idCol, s"$targetPred AS _t", s"split($textCol, ' ') AS _toks")
      .filter(expr("size(_toks) >= 2"))
      .selectExpr(idCol, "_t",
        "explode(transform(sequence(1, size(_toks) - 1), i -> struct(_toks[i-1] AS w1, _toks[i] AS w2))) AS _bg")
      .selectExpr(idCol, "_t", "_bg.w1 AS w1", "_bg.w2 AS w2")
    val bi = b.groupBy(col("w1"), col("w2")).agg(
      count(lit(1)).as("c12"),
      sum(expr("CASE WHEN _t THEN 1 ELSE 0 END")).as("c12_t"))
    val uni = b.groupBy(col("w1")).agg(
      count(lit(1)).as("c1"),
      sum(expr("CASE WHEN _t THEN 1 ELSE 0 END")).as("c1_t"))
    val v = docs.selectExpr(s"explode(split($textCol, ' ')) AS _w")
      .agg(countDistinct(col("_w")).as("v"))
    b.join(bi, Seq("w1", "w2"))
      .join(uni, Seq("w1"))
      .crossJoin(broadcast(v))
      .withColumn("_term",
        expr("cast(round(ln((c12_t + 1.0) / (c1_t + v)) * 1000000) AS bigint) - " +
          "cast(round(ln((c12 + 1.0) / (c1 + v)) * 1000000) AS bigint)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("_term")).as("_s"))
      .withColumn("avg_weight", expr("round(_s / n_bigrams / 1000000.0, 6)"))
      .select(col(idCol), col("n_bigrams"), col("avg_weight"))
  }

  private def qDsir(s: SparkSession, d: String): DataFrame =
    dsirWeights(Tables.spread(s, Tables.documents(s, d)), "doc_id", "text",
      "lang = 'en'")
      .orderBy(col("doc_id"))

  /** Tokenizer fertility per language (r11): BPE tokens per whitespace
    * word and bytes per BPE token — the two numbers that decide whether a
    * tokenizer is fair to a language (high fertility = the language pays
    * more sequence length per word, trains and serves slower per unit of
    * text) and how a byte budget converts to a token budget. Uses the
    * engine's real greedy-merge `bpe_count` kernel, so the ratios audit
    * the ACTUAL tokenizer, not a proxy.
    *
    * Determinism: all three per-doc counts are integers from map-side
    * kernels; the per-language ratios are integer micro-divisions over
    * the summed longs — no double anywhere.
    *
    * 100 TB shape: one scan, kernels fold map-side, ONE bounded hash
    * aggregation on the language key (partials = |langs| per map
    * partition); text never rides the shuffle. */
  private[graft] def tokenizerFertility(docs: DataFrame, langCol: String,
      textCol: String): DataFrame = {
    graft.functions.TextHash.ensureRegistered(docs.sparkSession)
    docs
      .selectExpr(s"$langCol AS lang",
        s"cast(bpe_count($textCol) AS bigint) AS _nb",
        s"cast(size(split($textCol, ' ')) AS bigint) AS _nw",
        s"cast(octet_length($textCol) AS bigint) AS _nbytes")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_nb")).as("n_bpe_tokens"),
        sum(col("_nw")).as("n_words"),
        sum(col("_nbytes")).as("n_bytes"))
      .withColumn("fertility_micro",
        expr("n_bpe_tokens * 1000000 div n_words"))
      .withColumn("bytes_per_token_micro",
        expr("n_bytes * 1000000 div n_bpe_tokens"))
      .orderBy(col("lang"))
  }

  private def qTokFertility(s: SparkSession, d: String): DataFrame =
    tokenizerFertility(Tables.spread(s, Tables.documents(s, d)), "lang", "text")

  /** Exact phrase search via positional postings (r11): documents
    * containing the token phrase, with occurrence count and first
    * position — the capability BM25's bag-of-words ranking cannot express
    * (order matters) and the reason real search indexes store positions.
    *
    * 100 TB shape, inside-out: a `contains(text, "w1 w2 …")` prefilter
    * runs AT THE SCAN — sound because a token-level match implies the
    * space-joined substring appears (tokens are space-delimited), so it
    * never false-drops; only surviving docs explode into postings, and
    * postings are built for the PHRASE'S terms only (the isin filter sits
    * under the explode projection, so the posting shuffle carries the two
    * terms' lists, never the corpus vocabulary). Adjacency is then one
    * (doc, pos) equi-join per additional term — each join key already
    * co-partitioned on doc_id — and the final per-doc count is a bounded
    * hash agg. Text never rides a shuffle; position ints do. */
  private[graft] def phraseSearch(docs: DataFrame, idCol: String,
      textCol: String, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty)
    val pre = docs.filter(col(textCol).contains(phrase.mkString(" ")))
    val posts = pre
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("_toks"))
      .select(col("doc_id"), posexplode(col("_toks")).as(Seq("pos", "term")))
      .filter(col("term").isin(phrase: _*))
    val first = posts.filter(col("term") === phrase.head)
      .select(col("doc_id"), col("pos"))
    val matched = phrase.zipWithIndex.tail.foldLeft(first) {
      case (acc, (t, i)) =>
        acc.join(posts.filter(col("term") === t)
            .select(col("doc_id"), (col("pos") - i).as("pos")),
          Seq("doc_id", "pos"))
    }
    matched.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"), min(col("pos")).as("first_pos"))
  }

  private def qPhraseSearch(s: SparkSession, d: String): DataFrame =
    phraseSearch(Tables.documents(s, d), "doc_id", "text",
      Seq("value", "table"))
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_phrase_search" -> qPhraseSearch _,
    "q_pmi" -> qPmi _,
    "q_vocab_coverage" -> qVocabCoverage _,
    "q_entropy" -> qEntropy _,
    "q_dsir" -> qDsir _,
    "q_tok_fertility" -> qTokFertility _)

  val oracle: Map[String, String] = Map(
    "q_phrase_search" ->
      """WITH f AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents WHERE contains(text, 'value table')),
        |w AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1),
        |           i -> struct_pack(p := i - 1, w := toks[i]))) AS u
        |  FROM f),
        |p AS (SELECT doc_id, u.p AS pos, u.w AS term FROM w),
        |a AS (SELECT doc_id, pos FROM p WHERE term = 'value'),
        |b AS (SELECT doc_id, pos - 1 AS pos FROM p WHERE term = 'table')
        |SELECT doc_id, count(*) AS n_matches, min(pos) AS first_pos
        |FROM a JOIN b USING (doc_id, pos)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_tok_fertility" -> {
      val bpe = graft.functions.BpeCount.duckExpr("text")
      s"""WITH d AS (
         |  SELECT lang, cast($bpe AS bigint) AS nb,
         |         cast(len(string_split(text, ' ')) AS bigint) AS nw,
         |         cast(strlen(text) AS bigint) AS nbytes
         |  FROM documents),
         |g AS (
         |  SELECT lang, cast(count(*) AS bigint) AS n_docs,
         |         cast(sum(nb) AS bigint) AS n_bpe_tokens,
         |         cast(sum(nw) AS bigint) AS n_words,
         |         cast(sum(nbytes) AS bigint) AS n_bytes
         |  FROM d GROUP BY lang)
         |SELECT lang, n_docs, n_bpe_tokens, n_words, n_bytes,
         |       n_bpe_tokens * 1000000 // n_words AS fertility_micro,
         |       n_bytes * 1000000 // n_bpe_tokens AS bytes_per_token_micro
         |FROM g ORDER BY lang""".stripMargin
    },
    "q_dsir" ->
      """WITH t AS (SELECT doc_id, lang = 'en' AS is_t,
        |                  string_split(text, ' ') AS toks
        |           FROM documents WHERE len(string_split(text, ' ')) >= 2),
        |b AS (SELECT doc_id, is_t,
        |             unnest(list_transform(range(1, len(toks)),
        |               i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS bg
        |      FROM t),
        |bg AS (SELECT doc_id, is_t, bg.w1 AS w1, bg.w2 AS w2 FROM b),
        |bi AS (SELECT w1, w2, count(*) AS c12,
        |              sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS c12_t
        |       FROM bg GROUP BY 1, 2),
        |uni AS (SELECT w1, count(*) AS c1,
        |               sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS c1_t
        |        FROM bg GROUP BY 1),
        |vv AS (SELECT count(DISTINCT w) AS v FROM
        |        (SELECT unnest(string_split(text, ' ')) AS w FROM documents)),
        |sc AS (SELECT doc_id,
        |              cast(round(ln((c12_t + 1.0) / (c1_t + v)) * 1000000) AS bigint) -
        |              cast(round(ln((c12 + 1.0) / (c1 + v)) * 1000000) AS bigint) AS term
        |       FROM bg JOIN bi USING (w1, w2) JOIN uni USING (w1), vv)
        |SELECT doc_id, count(*) AS n_bigrams,
        |       round(sum(term) / count(*) / 1000000.0, 6) AS avg_weight
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
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
