package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between dedup and export (builder brief: first-class alongside the
  * dedup/similarity/text-analysis families):
  *
  *  - deterministic hash sampling (reproducible sub-corpora — a `rand()`
  *    sample can't be re-derived or oracle-checked; a key-hash sample is
  *    stable across runs, partitionings, and engines);
  *  - group-wise top-k selection (keep the best k documents per stratum);
  *  - decontamination (drop training documents whose exact text appears
  *    in an evaluation set — the left-anti fingerprint join every eval
  *    pipeline runs before training).
  *
  * Scale: the sample is a pure map-side filter (no shuffle); top-k per
  * group is one shuffle on the stratum key with WindowGroupLimit pruning
  * per partition; decontamination is a shuffled left-anti join on the
  * fingerprint where AQE broadcasts the (small) eval side.
  */
object CorpusOps {

  /** Knuth's multiplicative constant — an integer-exact stratifier both
    * Spark and DuckDB compute identically (no float, no hex parsing). */
  private[graft] val HashA = 2654435761L
  private[graft] val HashM = 4294967296L // 2^32
  private[graft] val HashR = 2147483648L // 2^31 — pre-reduction domain

  /** The deterministic multiplicative-hash draw in [0, 2^32) used by
    * every sampling operator: `((id mod 2^31 + 2^31) mod 2^31) · A mod
    * 2^32`. The id is reduced into [0, 2^31) FIRST so the product is at
    * most (2^31−1)·A < 2^63 — exact in signed 64-bit for ANY long id in
    * both engines; the raw `id · A` form overflows (ANSI crash in Spark,
    * Out of Range in DuckDB, silent negative keep-everything with ANSI
    * off) once ids pass ~3.4e9 — e.g. 60-bit hash ids. The double-mod
    * also lands negative ids in range. */
  private[graft] def hashDraw(id: org.apache.spark.sql.Column) =
    ((id % HashR + HashR) % HashR) * HashA % HashM
  /** The same draw in DuckDB SQL, token-for-token. */
  private[graft] def hashDrawDuck(id: String): String =
    s"(($id % $HashR + $HashR) % $HashR) * $HashA % $HashM"

  /** 20% reproducible sample, stratified per document key: keep doc when
    * the [[hashDraw]] lands in the lowest fifth of each residue class. */
  private def qStratifiedSample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(hashDraw(col("doc_id")) % 5 === 0)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** Top-3 documents per (lang, source) stratum by length, doc_id
    * tie-break — the keep-best-k selection step. */
  private def qGroupTopk(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("lang"), col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .orderBy(col("lang"), col("source"), col("rk"))
  }

  /** Exact-k reproducible sample per stratum — the distributed
    * reservoir-sample replacement. A rate sample ([[qStratifiedSample]])
    * can't promise a per-stratum budget; ordering each stratum by the
    * deterministic [[hashDraw]] (doc-id tie-break) and keeping the first
    * `k` yields exactly min(k, |stratum|) rows, reproducible across
    * runs, partitionings, and engines — no rand(), no driver-side
    * reservoir state. One bounded window shuffle on the stratum key;
    * WindowGroupLimit prunes each partition to k before the exchange. */
  private[graft] def groupSample(docs: DataFrame, strata: Seq[String],
      idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(col("_draw").asc, col(idCol).asc)
    docs.withColumn("_draw", hashDraw(col(idCol)))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Exactly 10 docs per language, hash-draw order: the fixed-budget
    * per-stratum sample (eval-set carving, human-review batches). */
  private def qGroupSample(s: SparkSession, d: String): DataFrame =
    groupSample(Tables.spread(s, Tables.documents(s, d)),
      Seq("lang"), "doc_id", 10)
      .select(col("lang"), col("rk"), col("doc_id"),
        col("_draw").as("draw"))
      .orderBy(col("lang"), col("rk"))

  /** [[qGroupSample]]'s exact semantics through the CUSTOM AGGREGATE path
    * (`q_sample_agg`): [[graft.functions.SampleK]] folds each mapper's
    * rows into a k-bounded buffer BEFORE the exchange, so the shuffle
    * carries |mappers|·|strata|·k fixed-width pairs instead of every row,
    * and no per-group sort runs — the 100 TB form of the window query
    * (whose plan still sorts each partition under WindowGroupLimit).
    * Payload order in the aggregate's array IS (draw, id) ascending, so
    * `posexplode` position + 1 ≡ the window's row_number and the
    * `q_group_sample` oracle is shared verbatim; the draw rides back via
    * the same map-side [[hashDraw]], never through the aggregate. */
  private[graft] def sampleAgg(docs: DataFrame, strata: Seq[String],
      idCol: String, k: Int): DataFrame = {
    graft.functions.SampleK.ensureRegistered(docs.sparkSession)
    docs.withColumn("_draw", hashDraw(col(idCol)))
      .groupBy(strata.map(col): _*)
      .agg(expr(s"sample_k(_draw, $idCol, $k)").as("_ids"))
      .select(strata.map(col) :+
        posexplode(col("_ids")).as(Seq("_pos", idCol)): _*)
      .select(strata.map(col) ++ Seq(
        (col("_pos") + 1).cast("int").as("rk"), col(idCol),
        hashDraw(col(idCol)).as("draw")): _*)
  }

  private def qSampleAgg(s: SparkSession, d: String): DataFrame =
    sampleAgg(Tables.spread(s, Tables.documents(s, d)),
      Seq("lang"), "doc_id", 10)
      .orderBy(col("lang"), col("rk"))

  /** Deterministic train/val/test assignment: each doc's split follows
    * its [[hashDraw]] residue mod 100 — `< trainPct` → train,
    * `< trainPct + valPct` → val, else test. No rand(): the same doc
    * lands in the same split on every run, partitioning, engine, and
    * INCREMENTAL ingest (a re-crawled or late-arriving doc can never
    * migrate across the split boundary and leak eval into train —
    * the property rand-based splitters silently lose on re-runs).
    * Entirely map-side. */
  private[graft] def dataSplit(docs: DataFrame, idCol: String,
      trainPct: Int, valPct: Int): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"need 0 < trainPct and trainPct + valPct < 100, got $trainPct/$valPct")
    val draw = hashDraw(col(idCol)) % 100
    docs.withColumn("split",
      when(draw < trainPct, lit("train"))
        .when(draw < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  private def qDataSplit(s: SparkSession, d: String): DataFrame =
    dataSplit(Tables.documents(s, d), "doc_id", trainPct = 90, valPct = 5)
      .select(col("doc_id"), col("lang"), col("split"))
      .orderBy(col("doc_id"))

  /** Split-leakage audit: passages (non-overlapping 32-token chunks)
    * whose copies land in DIFFERENT splits under [[dataSplit]] — the
    * silent eval contamination splitting causes when it runs before (or
    * without) passage-level dedup: the model trains on text that also
    * sits in its test set. Emits one row per leaking chunk fingerprint
    * with copy count, split spread, train/eval copy tallies, and the
    * canonical (minimum) doc id. The fix this audit motivates is
    * q_training_pipeline's ordering — dedup first, split after. Shape:
    * the map-side [[chunkDocs]] explode + the map-side split CASE, then
    * ONE fingerprint hash agg (the shuffle carries hashes + ids, never
    * chunk text). */
  private def qSplitLeakage(s: SparkSession, d: String): DataFrame = {
    val chunks = chunkDocs(Tables.spread(s, Tables.documents(s, d)),
        "doc_id", "text", window = 32, overlap = 0)
      .withColumn("chunk_hash", md5(col("chunk_text")))
      .select(col("doc_id"), col("chunk_hash"))
    dataSplit(chunks, "doc_id", trainPct = 90, valPct = 5)
      .groupBy(col("chunk_hash"))
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col("split")).as("n_splits"),
        min(col("doc_id")).as("keep_id"),
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") =!= "train", 1L).otherwise(0L)).as("n_eval"))
      .filter(col("n_splits") > 1)
      .select(col("chunk_hash"), col("n_copies"), col("n_splits"),
        col("keep_id"), col("n_train"), col("n_eval"))
      .orderBy(col("chunk_hash"))
  }

  /** PII scrubbing, token-level and regex-free (regex dialects differ
    * across engines — these rules are pure string algebra, identical in
    * Spark and DuckDB): a token containing `@` becomes `<EMAIL>`; a
    * token of ≥ 7 characters that is ALL digits (translate strips
    * '0'-'9' to empty) becomes `<PHONE>`. Returns per-doc counts and the
    * scrubbed text; the transform is one map-side higher-order-function
    * pass — no explode, no shuffle, runs at scan speed. Production
    * deployments widen the rule set (or swap in an NER model via the
    * multimodal batch seam); the counting/rewrite plumbing stays. */
  private[graft] def piiScrub(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val isEmail = "t LIKE '%@%'"
    val isPhone = "length(t) >= 7 AND translate(t, '0123456789', '') = ''"
    docs.selectExpr(s"$idCol AS doc_id", s"split($textCol, ' ') AS toks")
      .selectExpr("doc_id",
        "cast(size(toks) AS bigint) AS n_tokens",
        s"cast(size(filter(toks, t -> $isEmail)) AS bigint) AS n_emails",
        s"cast(size(filter(toks, t -> NOT ($isEmail) AND $isPhone)) AS bigint) AS n_phones",
        s"array_join(transform(toks, t -> CASE WHEN $isEmail THEN '<EMAIL>' " +
          s"WHEN $isPhone THEN '<PHONE>' ELSE t END), ' ') AS scrubbed")
  }

  private def qPiiScrub(s: SparkSession, d: String): DataFrame =
    piiScrub(Tables.spread(s, Tables.documents(s, d)), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** Decontamination: documents sharing an exact text fingerprint with the
    * evaluation set (stand-in: every 97th doc_id) are removed — including
    * non-eval duplicates of eval texts, which is the point of matching on
    * the fingerprint rather than the id. */
  private def qDecontaminate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), md5(col("text")).as("fp"))
    val evalFps = docs.filter(col("doc_id") % 97 === 0).select(col("fp"))
    docs.join(evalFps, Seq("fp"), "left_anti")
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** Fuzzy decontamination parameters: 13-gram overlap is the published
    * standard for near-verbatim eval contamination (whitespace/punctuation
    * variants and partial copies that beat an exact-fingerprint match);
    * eval stand-in = every 7th doc_id; a train doc is flagged when ≥ half
    * its distinct 13-grams appear in one eval doc. Grams present in more
    * than [[EvalGramMax]] eval docs are boilerplate, not contamination
    * signal — dropping them also caps the join fan-out per gram, which is
    * what keeps the shuffle bounded when an eval suite carries a hot
    * header line across thousands of docs. */
  private[graft] val NgramSize = 13
  private[graft] val EvalMod = 7
  private[graft] val OverlapThreshold = 0.5
  private[graft] val EvalGramMax = 10

  /** Distinct word n-gram hashes per doc: (idCol, hs), via the fused
    * native kernel ([[graft.functions.ShingleH60]]). */
  private def gramHashes(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.selectExpr(idCol, s"shingle_h60($textCol, $n) AS hs")

  /** N-gram-overlap core, the ONE implementation behind both the driver
    * query and [[graft.api.Graft.ngramOverlapPairs]]: for each (train doc,
    * eval doc) pair, the fraction of the train doc's distinct `n`-grams
    * appearing in the eval doc — (idCol, eval_id, n_common, n_grams,
    * overlap), un-thresholded. Inverted-index shape: explode grams on both
    * sides, equi-join on the gram hash (never doc × doc), count matches
    * per pair. Grams in more than `evalGramMax` eval docs are dropped as
    * boilerplate — no contamination signal, and the cap bounds the
    * per-gram join fan-out. The frequency cap is applied as a
    * pre-aggregated semi-join, not a `count over (partition by g)` window
    * (VERDICT r8 #1): the window form shuffles AND
    * sorts every eval gram row; the aggregate form ships only partial
    * counts (map-side combine), and the surviving rare-gram set is small
    * enough that AQE broadcasts the semi-join — the exploded eval rows
    * then cross no extra shuffle before the main gram join. */
  private[graft] def ngramOverlap(trainDocs: DataFrame, evalDocs: DataFrame,
      idCol: String, textCol: String, n: Int, evalGramMax: Int): DataFrame = {
    graft.functions.TextHash.ensureRegistered(trainDocs.sparkSession)
    val train = gramHashes(trainDocs, idCol, textCol, n)
      .select(col(idCol), explode(col("hs")).as("g"),
        size(col("hs")).cast("bigint").as("n_grams"))
    val evGrams = gramHashes(evalDocs, idCol, textCol, n)
      .select(col(idCol).as("eval_id"), explode(col("hs")).as("g"))
    val rareGrams = evGrams.groupBy(col("g"))
      .agg(count(lit(1)).as("gram_df"))
      .filter(col("gram_df") <= evalGramMax)
      .select(col("g"))
    val ev = evGrams.join(rareGrams, Seq("g"), "left_semi")
    train.join(ev, Seq("g"))
      .groupBy(col(idCol), col("eval_id"), col("n_grams"))
      .agg(count(lit(1)).as("n_common"))
      .select(col(idCol), col("eval_id"), col("n_common"), col("n_grams"),
        round(col("n_common") / col("n_grams"), 6).as("overlap"))
  }

  /** Driver binding of [[ngramOverlap]]: eval stand-in = every
    * [[EvalMod]]-th doc_id, flagged at [[OverlapThreshold]]. */
  private def qDecontaminateNgram(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.spread(s, Tables.documents(s, d))
    ngramOverlap(
        docs.filter(col("doc_id") % EvalMod =!= 0),
        docs.filter(col("doc_id") % EvalMod === 0),
        "doc_id", "text", NgramSize, EvalGramMax)
      .filter(col("overlap") >= OverlapThreshold)
      .orderBy(col("doc_id"), col("eval_id"))
  }

  /** Gopher/C4-style intra-document repetition thresholds (tuned to the
    * synthetic corpus so both keep outcomes occur): drop a doc when its
    * token stream is mostly repeats, its 2-gram stream repeats, or one
    * 2-gram dominates. Compared on the 6-dp ROUNDED metrics in both
    * engines, so the flag can never flip on float noise at the boundary. */
  private[graft] val MaxDupTokenRatio = 0.6
  private[graft] val MaxDup2gramRatio = 0.06
  private[graft] val Max2gramFrac = 0.09

  /** Repetition-signal core, the ONE implementation behind both the driver
    * query and [[graft.api.Graft.repetitionStats]]: the within-document
    * repetition signals every large-scale curation pipeline computes
    * (duplicate-token ratio, duplicate-2-gram ratio, most-common-2-gram
    * share). Entirely map-side — no shuffle, no explode — and LINEAR in
    * document length: the counting runs in the one-pass native kernel
    * [[graft.functions.RepetitionStats]] (open-addressing 2-gram counts),
    * replacing a composed `filter`-inside-`transform` whose O(distinct ×
    * total) per-row cost made one pathological long document a straggler.
    * The ratio/rounding expressions keep the exact composed shape (int
    * division → double, 6-dp round) the DuckDB oracle replicates. */
  private[graft] def repetitionStats(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    graft.functions.TextHash.ensureRegistered(docs.sparkSession)
    docs
      .selectExpr(idCol, s"repetition_stats($textCol) AS _r")
      .selectExpr(idCol,
        "cast(_r.n_tokens AS bigint) AS n_tokens",
        "round(1.0 - _r.n_distinct_tokens / _r.n_tokens, 6) AS dup_token_ratio",
        "round(1.0 - _r.n_distinct_2grams / _r.n_2grams, 6) AS dup_2gram_ratio",
        "round(_r.max_2gram_count / _r.n_2grams, 6) AS max_2gram_frac")
  }

  /** Window width for cross-document duplicated-span detection: long
    * enough that a shared window is a COPY, not vocabulary coincidence
    * (at w=3 every doc in the synthetic corpus collides; at w=8 only the
    * planted near-dup spans survive — measured, not guessed). */
  private[graft] val SpanW = 8

  /** Exact-substring span dedup core, the ONE implementation behind the
    * driver query and [[graft.api.Graft.duplicatedSpans]]: the
    * fixed-width-window approximation of suffix-array substring dedup —
    * the method large-scale corpus builds use to cut verbatim copied
    * passages that whole-document MinHash can't see (a boilerplate
    * paragraph inside an otherwise unique page). Every `w`-token window
    * of every document is hashed in place; a window hash appearing in
    * MORE THAN ONE document marks a cross-document duplicated span.
    * Output per affected doc: window count, duplicated-window count, the
    * longest CONSECUTIVE duplicated run (its token length is
    * `max_run + w - 1` — the span a cutter would excise), and the
    * duplicated ratio.
    *
    * Scale shape: windows hash MAP-SIDE (h60_array over the positional
    * window strings — text never rides a shuffle; the explode carries
    * (id, pos, 8-byte hash) only). The window-frequency aggregation is a
    * partial+final hash agg on the hash key; the surviving duplicated
    * hash set is tiny (copies, not the corpus), so AQE broadcasts the
    * left-semi join back onto the position rows. Run-length analysis is
    * one exchange on the doc id over ONLY the duplicated positions
    * (gaps-and-islands), never the full position stream. Intra-document
    * repeats are deliberately NOT flagged (that is
    * [[repetitionStats]]'s job): the frequency count is `countDistinct`
    * over docs, so a chorus repeated 50× inside one song flags nothing. */
  private[graft] def duplicatedSpans(docs: DataFrame, idCol: String,
      textCol: String, w: Int): DataFrame = {
    graft.functions.TextHash.ensureRegistered(docs.sparkSession)
    // Hashed ONCE, then referenced by both the frequency agg and the
    // position semi-join: without the materialization the two plan
    // branches would each re-split + re-hash every document (two full
    // corpus text passes at 100 TB). One row per doc (id + long array),
    // far smaller than the corpus text it replaces.
    val hashed = Materialize(docs
      .selectExpr(idCol,
        s"""h60_array(transform(
           |  sequence(1, greatest(size(split($textCol, ' ')) - ${w - 1}, 1)),
           |  i -> array_join(slice(split($textCol, ' '), i, $w), ' '))) AS hs"""
          .stripMargin))
    val pos = hashed
      .select(col(idCol), size(col("hs")).cast("bigint").as("n_windows"),
        posexplode(col("hs")))
      .select(col(idCol), col("n_windows"), (col("pos") + 1L).as("pos"),
        col("col").as("g"))
    val dupG = pos.groupBy(col("g"))
      .agg(countDistinct(col(idCol)).as("nd"))
      .filter(col("nd") > 1)
      .select(col("g"))
    val dup = pos.join(dupG, Seq("g"), "left_semi")
    val wnd = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    dup.withColumn("island", col("pos") - row_number().over(wnd))
      .groupBy(col(idCol), col("island"))
      .agg(max(col("n_windows")).as("n_windows"), count(lit(1)).as("run"))
      .groupBy(col(idCol))
      .agg(max(col("n_windows")).as("n_windows"),
        sum(col("run")).as("n_dup"), max(col("run")).as("max_run"))
      .select(col(idCol), col("n_windows"), col("n_dup"), col("max_run"),
        round(col("n_dup") / col("n_windows"), 6).as("dup_ratio"))
  }

  /** Driver binding of [[duplicatedSpans]] at [[SpanW]]. */
  private def qSubstringDedup(s: SparkSession, d: String): DataFrame =
    duplicatedSpans(Tables.spread(s, Tables.documents(s, d)),
        "doc_id", "text", SpanW)
      .orderBy(col("doc_id"))

  /** Driver binding of [[repetitionStats]] plus the keep decision at the
    * documented thresholds. */
  private def qRepetitionFilter(s: SparkSession, d: String): DataFrame =
    repetitionStats(Tables.spread(s, Tables.documents(s, d)), "doc_id", "text")
      .selectExpr("doc_id", "n_tokens", "dup_token_ratio", "dup_2gram_ratio",
        "max_2gram_frac",
        s"(dup_token_ratio <= $MaxDupTokenRatio AND dup_2gram_ratio <= $MaxDup2gramRatio AND max_2gram_frac <= $Max2gramFrac) AS keep")
      .orderBy(col("doc_id"))

  /** Domain-mixing weights for training-data sampling: per (lang, source)
    * stratum, the doc/token counts and a sub-linear sampling weight
    * `sqrt(stratum_tokens / total_tokens)` — the α=0.5 temperature that
    * up-weights small domains without letting one giant crawl dominate.
    * All sums are exact integers; the ONLY floating ops are one division
    * and one sqrt per stratum (both IEEE-exact and engine-identical) —
    * deliberately NOT `pow(x, α)`/`sum(sqrt(...))`, whose libm drift and
    * summation order would break cross-engine hashes. One hash agg over
    * bounded strata + a broadcast 1-row total: scales. */
  private[graft] def domainMix(docs: DataFrame, strata: Seq[String],
      textCol: String): DataFrame = {
    val grouped = docs.groupBy(strata.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col(textCol), " ")).cast("long")).as("n_tokens"))
    val total = grouped.agg(sum(col("n_tokens")).as("_total"))
    grouped.crossJoin(broadcast(total))
      .selectExpr(strata ++ Seq("n_docs", "n_tokens",
        "round(sqrt(n_tokens / _total), 6) AS weight"): _*)
  }

  private def qDomainMix(s: SparkSession, d: String): DataFrame =
    domainMix(Tables.spread(s, Tables.documents(s, d)),
      Seq("lang", "source"), "text")
      .orderBy(col("lang"), col("source"))

  /** Weighted-sample core behind the driver query and
    * [[graft.api.Graft.weightedSample]]: every doc keeps a deterministic
    * multiplicative-hash draw in [0, 10⁶) and survives when it lands
    * under its stratum's α=0.5 mix threshold. Thresholds are exact
    * integers computed in ONE expression (`round(sqrt(ratio)·10⁶)`), the
    * same shape the oracle replicates — comparing raw scaled doubles
    * would sit one ulp from flipping boundary docs. Output = the input
    * columns + the `_thresh` internal. */
  private[graft] def weightedSample(docs: DataFrame, strata: Seq[String],
      idCol: String, textCol: String): DataFrame = {
    val grouped = docs.groupBy(strata.map(col): _*)
      .agg(sum(size(split(col(textCol), " ")).cast("long")).as("_n_tokens"))
    val total = grouped.agg(sum(col("_n_tokens")).as("_total"))
    val weights = grouped.crossJoin(broadcast(total))
      .selectExpr(strata :+
        "cast(round(sqrt(_n_tokens / _total) * 1000000) AS bigint) AS _thresh": _*)
    docs.join(broadcast(weights), strata)
      .filter(hashDraw(col(idCol)) % 1000000L < col("_thresh"))
  }

  /** Corpus-level boilerplate detection: the 20 most document-frequent
    * word 5-grams (the repeated header/footer/license spans C4-style
    * pipelines strip). Shingles come pre-deduped per doc from the native
    * kernel, so a plain count IS the document frequency; top-k rides
    * `orderBy.limit` (TakeOrderedAndProject — never a global sort), and
    * the shuffle carries (gram, partial count), never text. */
  private[graft] def boilerplateNgrams(docs: DataFrame, textCol: String,
      n: Int, k: Int): DataFrame = {
    graft.functions.TextHash.ensureRegistered(docs.sparkSession)
    docs.selectExpr(s"shingle_h60($textCol, $n) AS _hs")
      .select(explode(col("_hs")).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("gram"))
      .limit(k)
  }

  private def qCommonNgrams(s: SparkSession, d: String): DataFrame =
    boilerplateNgrams(Tables.spread(s, Tables.documents(s, d)), "text", 5, 20)

  /** Weighted corpus sampling at the [[qDomainMix]] rates: every doc keeps
    * a deterministic multiplicative-hash draw in [0, 10⁶) and survives
    * when it lands under its stratum's weight — so the sampled corpus
    * follows the α=0.5 domain mix WITHOUT rand() (reproducible across
    * runs, partitionings, and engines; re-runnable on a grown corpus).
    * The per-stratum thresholds are exact integers (`round(weight·10⁶)` —
    * comparing raw `weight·10⁶` doubles against the hash would be one
    * ulp from flipping boundary docs); weights ride the same broadcast
    * as [[qDomainMix]]'s total. */
  private def qWeightedSample(s: SparkSession, d: String): DataFrame =
    weightedSample(Tables.spread(s, Tables.documents(s, d)),
      Seq("lang", "source"), "doc_id", "text")
      .select(col("doc_id"), col("lang"), col("source"),
        col("_thresh").as("thresh"))
      .orderBy(col("doc_id"))

  /** The end-to-end curation pipeline, composed from this file's
    * operators the way a production corpus build chains them — length
    * floor → intra-doc repetition rules ([[repetitionStats]], native
    * kernel) → exact dedup (content-hash keeper only) — reported as
    * per-language survivor counts/tokens. One flagship query proving the
    * stages COMPOSE: each filter is a map-side predicate or one hash
    * agg; nothing shuffles text except the dedup fingerprint exchange
    * (and that carries md5+id, not text). */
  private def qCurationPipeline(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.spread(s, Tables.documents(s, d))
    val repKeep = repetitionStats(docs, "doc_id", "text")
      .filter(col("n_tokens") >= 20 &&
        col("dup_token_ratio") <= MaxDupTokenRatio &&
        col("dup_2gram_ratio") <= MaxDup2gramRatio &&
        col("max_2gram_frac") <= Max2gramFrac)
      .select(col("doc_id"), col("n_tokens"))
    val keepers = docs
      .groupBy(md5(col("text").cast("binary")).as("_fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    docs.select(col("doc_id"), col("lang"))
      .join(repKeep, "doc_id")
      .join(keepers, "doc_id")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .orderBy(col("lang"))
  }

  /** The end-to-end training-data preparation flagship — proving the r8
    * surface COMPOSES into one declarative plan: intra-doc repetition
    * quality gate → exact-dedup keeper → eval decontamination (exact
    * fingerprint, every-97th-doc stand-in) → deterministic 90/5/5
    * [[dataSplit]] → context-window chunk accounting (64-token windows,
    * 16 overlap) → per-(split, lang) doc/chunk/token budget, the table a
    * training run is provisioned from.
    *
    * Scale shape: the chunk numbers derive from `n_tokens` ALONE
    * (`size(sequence(...))` + an integer fold — no chunk explode, no
    * text carried past the quality gate), so after the three id
    * equi-joins the whole tail is map-side arithmetic into one bounded
    * hash agg. r9: the budget table also carries `n_bpe_tokens` — the
    * [[graft.functions.BpeCount]] greedy-merge count, the unit a
    * training run actually provisions in — computed at the scan
    * (map-side kernel), so only the per-doc long rides the joins. */
  private def qTrainingPipeline(s: SparkSession, d: String): DataFrame = {
    graft.functions.TextHash.ensureRegistered(s)
    val docs = Tables.spread(s, Tables.documents(s, d))
    val repKeep = repetitionStats(docs, "doc_id", "text")
      .filter(col("n_tokens") >= 20 &&
        col("dup_token_ratio") <= MaxDupTokenRatio &&
        col("dup_2gram_ratio") <= MaxDup2gramRatio &&
        col("max_2gram_frac") <= Max2gramFrac)
      .select(col("doc_id"), col("n_tokens"))
    val keepers = docs
      .groupBy(md5(col("text").cast("binary")).as("_fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val fps = docs.select(col("doc_id"), md5(col("text")).as("fp"))
    val evalFps = fps.filter(col("doc_id") % 97 === 0).select(col("fp"))
    val clean = fps.join(evalFps, Seq("fp"), "left_anti").select(col("doc_id"))
    val survivors = docs
      .selectExpr("doc_id", "lang", "bpe_count(text) AS _n_bpe")
      .join(repKeep, "doc_id").join(keepers, "doc_id").join(clean, "doc_id")
    dataSplit(survivors, "doc_id", trainPct = 90, valPct = 5)
      .selectExpr("split", "lang", "n_tokens", "_n_bpe",
        "cast(size(sequence(0L, n_tokens - 1, 48L)) AS bigint) AS n_chunks",
        "aggregate(sequence(0L, n_tokens - 1, 48L), 0L, " +
          "(acc, st) -> acc + least(cast(64 AS bigint), n_tokens - st)) AS chunk_tokens")
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chunks")).as("n_chunks"),
        sum(col("chunk_tokens")).as("n_tokens"),
        sum(col("_n_bpe")).as("n_bpe_tokens"))
      .orderBy(col("split"), col("lang"))
  }

  /** Epoch-seeded draw: the [[hashDraw]] multiplicative hash over a
    * seed-mixed id, so each epoch induces a DIFFERENT deterministic
    * permutation of the same corpus. */
  private[graft] def epochDraw(id: org.apache.spark.sql.Column, epoch: Int) =
    hashDraw(id * 131L + lit(epoch.toLong) * 17L)
  private[graft] def epochDrawDuck(id: String, epoch: Int): String =
    hashDrawDuck(s"($id * 131 + $epoch * 17)")

  /** Deterministic epoch shuffle + sharding, the ONE implementation
    * behind the driver query and [[graft.api.Graft.epochShuffle]]: every
    * training run needs each epoch to read the corpus in a fresh "random"
    * order that is nonetheless REPRODUCIBLE (restarts, distributed
    * readers, and audits must agree on it), materialized as `nShards`
    * shard files read sequentially. Each doc gets an epoch-seeded hash
    * draw; its shard is `draw mod nShards` and its position is its draw
    * rank WITHIN the shard (ties on the id) — so (shard, pos) is a
    * deterministic permutation that changes completely between epochs.
    *
    * Scale shape: sharding by hash means NO total-order sort over the
    * corpus (the classic shuffle-writer anti-pattern a global
    * `ORDER BY rand()` would cost); the only movement is ONE hash
    * exchange on the shard id, and each shard sorts locally — exactly
    * the physical layout of writing `nShards` training files. */
  private[graft] def epochShuffle(docs: DataFrame, idCol: String,
      epoch: Int, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(epoch >= 0, s"epoch must be non-negative, got $epoch")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("draw"), col(idCol))
    docs.select(col(idCol), epochDraw(col(idCol), epoch).as("draw"))
      .withColumn("shard", (col("draw") % nShards).cast("int"))
      .withColumn("pos", (row_number().over(w) - 1).cast("bigint"))
      .select(col(idCol), col("shard"), col("pos"), col("draw"))
  }

  /** Driver binding: epoch 7 over 8 shards. */
  private def qEpochShuffle(s: SparkSession, d: String): DataFrame =
    epochShuffle(Tables.documents(s, d), "doc_id", epoch = 7, nShards = 8)
      .orderBy(col("shard"), col("pos"))

  /** Context-window chunking: split each document's token stream into
    * overlapping windows of `window` tokens with `overlap` tokens shared
    * between consecutive chunks — the step that turns curated documents
    * into trainer-shaped rows (and RAG corpora into retrievable
    * passages). Chunk starts advance by `window - overlap`; the last
    * chunk is short rather than padded.
    *
    * Scale: one `split` + `posexplode(sequence(...))` per row — entirely
    * map-side, no shuffle; at 100 TB this runs at scan speed and the
    * only data growth is the overlap fraction. */
  private[graft] def chunkDocs(docs: DataFrame, idCol: String,
      textCol: String, window: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && window > overlap,
      s"need window > overlap >= 0, got window=$window overlap=$overlap")
    val stride = window - overlap
    docs.selectExpr(s"$idCol AS doc_id", s"split($textCol, ' ') AS toks")
      .selectExpr("doc_id", "toks", "size(toks) AS n_tokens")
      .select(col("doc_id"), col("toks"), col("n_tokens"),
        posexplode(expr(s"sequence(0, n_tokens - 1, $stride)"))
          .as(Seq("chunk_id", "start")))
      .selectExpr("doc_id", "cast(chunk_id AS bigint) AS chunk_id",
        "cast(start AS bigint) AS start",
        s"cast(least($window, n_tokens - start) AS bigint) AS chunk_tokens",
        s"array_join(slice(toks, start + 1, $window), ' ') AS chunk_text")
  }

  private def qDocChunks(s: SparkSession, d: String): DataFrame =
    chunkDocs(Tables.spread(s, Tables.documents(s, d)), "doc_id", "text",
      window = 64, overlap = 16)
      .orderBy(col("doc_id"), col("chunk_id"))

  /** Passage-level exact dedup: each document's non-overlapping
    * `window`-token chunks fingerprinted (md5) and every chunk flagged
    * `keep` = is-the-first-copy (lowest (doc_id, chunk_id) per
    * fingerprint) — the sub-document dedup granularity that catches
    * repeated spans (quoted passages, licenses, templated sections)
    * doc-level dedup is blind to, without common-n-gram noise. Downstream
    * training assembly drops `keep = false` chunks. Shape: the map-side
    * [[chunkDocs]] explode, then ONE window shuffle keyed by the chunk
    * fingerprint — the shuffle carries (hash, ids), never chunk text. */
  private[graft] def chunkDedup(docs: DataFrame, idCol: String,
      textCol: String, window: Int): DataFrame = {
    val w = Window.partitionBy(col("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_id"))
    chunkDocs(docs, idCol, textCol, window, overlap = 0)
      .withColumn("chunk_hash", md5(col("chunk_text").cast("binary")))
      .withColumn("keep", row_number().over(w) === 1)
      .select(col("doc_id"), col("chunk_id"), col("chunk_hash"), col("keep"))
  }

  private def qChunkDedup(s: SparkSession, d: String): DataFrame =
    chunkDedup(Tables.spread(s, Tables.documents(s, d)), "doc_id", "text",
      window = 32)
      .orderBy(col("doc_id"), col("chunk_id"))

  /** Sequence packing (concat-then-split): documents are concatenated in
    * id order and cut every `windowTokens` tokens; each doc is labeled
    * with the training bin its FIRST token lands in. Packing runs
    * independently within fixed blocks of `blockDocs` ids — the shard-
    * local packing production pipelines use — because a single global
    * prefix sum would need one total-order window over the corpus (the
    * scale anti-pattern this formulation exists to avoid: the block
    * window shuffles once on the bounded block key and every partition
    * cumulates independently). Requires a numeric `idCol`. */
  private[graft] def packSequences(docs: DataFrame, idCol: String,
      textCol: String, windowTokens: Int, blockDocs: Int): DataFrame = {
    val w = Window.partitionBy(col("block")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.selectExpr(s"$idCol AS doc_id",
        s"cast(size(split($textCol, ' ')) AS bigint) AS n_tokens")
      .withColumn("block", expr(s"doc_id div $blockDocs"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("bin", expr(s"(cum_tokens - n_tokens) div $windowTokens"))
      .select(col("doc_id"), col("block"), col("bin"), col("n_tokens"),
        col("cum_tokens"))
  }

  private def qSeqPack(s: SparkSession, d: String): DataFrame =
    packSequences(Tables.spread(s, Tables.documents(s, d)), "doc_id", "text",
      windowTokens = 2048, blockDocs = 100)
      .orderBy(col("doc_id"))

  /** Packed-sequence EMISSION — the trainer rows [[packSequences]] only
    * labels: documents concatenated in id order within each block, the
    * stream cut every `windowTokens` tokens into bins, and each (bin ×
    * doc) overlap emitted as one row with the span's doc-local offset,
    * bin-local offset, token count, and text. A doc longer than the
    * remaining bin space CARRIES OVER: its tail tokens become spans of
    * the following bin(s) — `doc_offset` advances, `bin_offset` resets
    * to 0 — so concatenating a bin's spans in `bin_offset` order yields
    * exactly `windowTokens` tokens (the last bin of a block may be
    * short). The trainer consumes bins; `doc_id` + `doc_offset` keep the
    * provenance needed for masking document boundaries in attention.
    *
    * Scale shape: the SAME single block-local window as [[packSequences]]
    * (one bounded shuffle on the block key, never a global-order prefix
    * sum), then a map-side explode of each doc into the ≤ ⌈n/W⌉ + 1 bins
    * it touches — output grows only by the bin-boundary splits, and the
    * text is sliced once, map-side, after the window. */
  private[graft] def emitPackedSequences(docs: DataFrame, idCol: String,
      textCol: String, windowTokens: Int, blockDocs: Int): DataFrame = {
    require(windowTokens > 0 && blockDocs > 0,
      s"need windowTokens > 0 and blockDocs > 0, got $windowTokens/$blockDocs")
    val w = Window.partitionBy(col("block")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.selectExpr(s"$idCol AS doc_id", s"split($textCol, ' ') AS toks")
      .withColumn("n_tokens", expr("cast(size(toks) AS bigint)"))
      .withColumn("block", expr(s"doc_id div $blockDocs"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("s", col("cum_tokens") - col("n_tokens"))
      // the bins this doc's global token range [s, cum) intersects
      .withColumn("bin", explode(expr(
        s"sequence(s div $windowTokens, (cum_tokens - 1) div $windowTokens)")))
      .withColumn("span_start",
        greatest(col("s"), expr(s"bin * ${windowTokens}L")))
      .withColumn("span_end",
        least(col("cum_tokens"), expr(s"(bin + 1) * ${windowTokens}L")))
      .selectExpr("block", "cast(bin AS bigint) AS bin", "doc_id",
        "cast(span_start - s AS bigint) AS doc_offset",
        s"cast(span_start - bin * ${windowTokens}L AS bigint) AS bin_offset",
        "cast(span_end - span_start AS bigint) AS span_tokens",
        "array_join(slice(toks, cast(span_start - s AS int) + 1, " +
          "cast(span_end - span_start AS int)), ' ') AS span_text")
  }

  private def qSeqEmit(s: SparkSession, d: String): DataFrame =
    emitPackedSequences(Tables.spread(s, Tables.documents(s, d)), "doc_id",
      "text", windowTokens = 2048, blockDocs = 100)
      .orderBy(col("block"), col("bin"), col("bin_offset"), col("doc_id"))

  /** Rounds of BPE merge learning for [[bpeTrain]]/`q_bpe_train` — shared
    * with the oracle builder so the two engines always unroll the same
    * count. */
  private[graft] val BpeTrainRounds = 8

  /** LEARN a BPE merge table from a corpus — the training half of the
    * tokenizer story ([[graft.functions.BpeCount]] encodes with a merge
    * table; this is where such a table comes from). Classic BPE: per
    * round, the highest-frequency adjacent symbol pair (ties broken
    * (count DESC, a, b) — a total order, engine-portable) becomes the
    * next merge, applied everywhere before the next round.
    *
    * Scale: the trainer's one corpus pass builds the WORD HISTOGRAM
    * (split + count, one shuffle); every round after that operates on
    * the vocab-sized histogram only — pair counting is an explode + hash
    * agg over (word-type, cnt) rows, never a rescan of 100 TB of text
    * (the same architecture production tokenizer trainers use). The
    * per-round argmax is a 1-row bounded collect (the merge RULE is
    * driver metadata by nature), and the merge application is a map-side
    * array fold on the histogram, materialized per round
    * ([[Materialize]], the CC-loop discipline) so plans don't nest.
    * The fold (`aggregate`: append, or coalesce the tail pair into the
    * merged symbol) is exactly the kernel's left-to-right
    * non-overlapping single pass: a fresh merge output can never equal
    * its own left part, so neither form can re-match inside the pair it
    * just produced. BMP-only parity contract as [[graft.functions
    * .BpeCount.duckMerged]] (symbols here are Spark characters, oracle
    * units are DuckDB characters). */
  private[graft] def bpeTrain(docs: DataFrame, textCol: String,
      rounds: Int = BpeTrainRounds): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val emptySyms = array().cast("array<string>")
    var hist = Materialize(docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      // characters via substring, not split(w, "") — Spark's regex split
      // keeps a trailing zero-width field, which would mint a phantom
      // empty symbol per word
      .select(transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1))).as("syms"),
        col("cnt")))
    val learned = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var r = 0
    var dry = false
    while (r < rounds && !dry) {
      val n = size(col("syms"))
      val top = hist
        .filter(size(col("syms")) > 1)
        .select(explode(zip_with(
            slice(col("syms"), lit(1), n - 1),
            slice(col("syms"), lit(2), n - 1),
            (a, b) => struct(a.as("a"), b.as("b")))).as("p"),
          col("cnt"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) dry = true
      else {
        val (a, b, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        learned += ((r, a, b, a + b, c))
        hist = Materialize(hist.select(
          aggregate(col("syms"), emptySyms, (acc, x) =>
            when(size(acc) > 0 &&
                element_at(acc, -1) === lit(a) && x === lit(b),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
              .otherwise(concat(acc, array(x)))).as("syms"),
          col("cnt")))
        r += 1
      }
    }
    learned.toSeq
      .toDF("merge_rank", "pair_a", "pair_b", "merged", "cnt")
      .orderBy(col("merge_rank"))
  }

  private def qBpeTrain(s: SparkSession, d: String): DataFrame =
    bpeTrain(Tables.documents(s, d), "text")

  /** Token SEQUENCES from the greedy-merge BPE kernel (r9): the encode
    * form of `q_token_count`'s budget unit — (doc, position, token,
    * token_id), the rows a packing pipeline actually feeds a trainer.
    * Ids come from the shared vocabulary ([[graft.functions.BpeCount
    * .idCase]]): merge outputs carry their rank, unmerged symbols
    * 1000 + codepoint — generated from the ONE merge table in both
    * engines. Map-side kernel + posexplode; no shuffle before the
    * output sort. Bounded to 50 docs (the sequence dump is a
    * per-document detail view, not a corpus aggregate). */
  private def qBpeEncode(s: SparkSession, d: String): DataFrame = {
    graft.functions.TextHash.ensureRegistered(s)
    Tables.documents(s, d)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), posexplode(expr("bpe_encode(text)")))
      .selectExpr("doc_id", "cast(pos + 1 AS int) AS pos", "col AS token",
        s"cast(${graft.functions.BpeCount.idCase("col", "ascii")} AS bigint) AS token_id")
      .orderBy(col("doc_id"), col("pos"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_doc_chunks" -> qDocChunks _,
    "q_bpe_encode" -> qBpeEncode _,
    "q_bpe_train" -> qBpeTrain _,
    "q_chunk_dedup" -> qChunkDedup _,
    "q_seq_pack" -> qSeqPack _,
    "q_seq_emit" -> qSeqEmit _,
    "q_stratified_sample" -> qStratifiedSample _,
    "q_data_split" -> qDataSplit _,
    "q_split_leakage" -> qSplitLeakage _,
    "q_pii_scrub" -> qPiiScrub _,
    "q_group_sample" -> qGroupSample _,
    "q_sample_agg" -> qSampleAgg _,
    "q_group_topk" -> qGroupTopk _,
    "q_decontaminate" -> qDecontaminate _,
    "q_decontaminate_ngram" -> qDecontaminateNgram _,
    "q_substring_dedup" -> qSubstringDedup _,
    "q_repetition_filter" -> qRepetitionFilter _,
    "q_domain_mix" -> qDomainMix _,
    "q_common_ngrams" -> qCommonNgrams _,
    "q_weighted_sample" -> qWeightedSample _,
    "q_curation_pipeline" -> qCurationPipeline _,
    "q_training_pipeline" -> qTrainingPipeline _,
    "q_epoch_shuffle" -> qEpochShuffle _
  )

  val oracle: Map[String, String] = Map(
    // BPE training, unrolled: the same rounds constant as the Spark
    // trainer, each round = adjacent-pair count over the bracket-encoded
    // word histogram, argmax with the (count DESC, a, b) tie order, then
    // a plain-string replace applying the merge (replace IS the
    // left-to-right non-overlapping pass — the BpeCount.duckMerged
    // discipline, here with the pattern coming from the round's own
    // 1-row CTE instead of a fixed table).
    "q_bpe_train" -> {
      val bracketize = "list_aggregate(list_transform(" +
        "range(1, length(w) + 1), " +
        "i -> '[' || w[CAST(i AS int):CAST(i AS int)] || ']'), " +
        "'string_agg', '')"
      val sb = new StringBuilder
      sb ++= s"""WITH words AS (
                |  SELECT w, CAST(count(*) AS bigint) AS cnt FROM (
                |    SELECT unnest(string_split(text, ' ')) AS w
                |    FROM documents) t
                |  WHERE length(w) > 0 GROUP BY w),
                |enc0 AS (SELECT $bracketize AS e, cnt FROM words)""".stripMargin
      for (r <- 0 until BpeTrainRounds) {
        sb ++= s""",
                  |p$r AS (
                  |  SELECT p[1] AS a, p[2] AS b, cnt FROM (
                  |    SELECT unnest(list_zip(u[1:n-1], u[2:n])) AS p, cnt
                  |    FROM (SELECT regexp_extract_all(e, '\\[([^\\]]*)\\]', 1) AS u,
                  |                 len(regexp_extract_all(e, '\\[([^\\]]*)\\]', 1)) AS n,
                  |                 cnt
                  |          FROM enc$r) x) z),
                  |best$r AS (
                  |  SELECT a, b, CAST(sum(cnt) AS bigint) AS c FROM p$r
                  |  GROUP BY a, b ORDER BY c DESC, a, b LIMIT 1),
                  |enc${r + 1} AS (
                  |  SELECT replace(e, '[' || a || '][' || b || ']',
                  |                 '[' || a || b || ']') AS e, cnt
                  |  FROM enc$r CROSS JOIN best$r)""".stripMargin
      }
      val arms = (0 until BpeTrainRounds).map { r =>
        s"SELECT $r AS merge_rank, a AS pair_a, b AS pair_b, " +
          s"a || b AS merged, c AS cnt FROM best$r"
      }.mkString("\nUNION ALL\n")
      sb.toString + "\n" + arms + "\nORDER BY merge_rank"
    },
    // BPE encode: the count oracle's bracket-fold, kept as a SEQUENCE —
    // strip the outer brackets, split on '][', drop space units, number
    // the tokens; ids from the same generated vocabulary CASE.
    "q_bpe_encode" -> {
      val merged = graft.functions.BpeCount.duckMerged("text")
      val idCase = graft.functions.BpeCount.idCase("token", "unicode")
      s"""WITH enc AS (
         |  SELECT doc_id, $merged AS m FROM documents WHERE doc_id < 50),
         |toks AS (
         |  SELECT doc_id,
         |         list_filter(string_split(m[2:length(m)-1], ']['),
         |                     t -> t <> ' ') AS l
         |  FROM enc),
         |flat AS (
         |  SELECT doc_id, unnest(l) AS token,
         |         unnest(range(1, len(l) + 1)) AS pos
         |  FROM toks)
         |SELECT doc_id, cast(pos AS int) AS pos, token,
         |       cast($idCase AS bigint) AS token_id
         |FROM flat ORDER BY doc_id, pos""".stripMargin
    },
    "q_doc_chunks" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |n AS (SELECT doc_id, toks, len(toks) AS n_tokens FROM t),
        |c AS (SELECT doc_id, toks, n_tokens,
        |             unnest(generate_series(0, n_tokens - 1, 48)) AS start
        |      FROM n)
        |SELECT doc_id, cast(start // 48 AS bigint) AS chunk_id,
        |       cast(start AS bigint) AS start,
        |       cast(least(64, n_tokens - start) AS bigint) AS chunk_tokens,
        |       array_to_string(toks[start + 1 : start + 64], ' ') AS chunk_text
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "q_chunk_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |n AS (SELECT doc_id, toks, len(toks) AS n_tokens FROM t),
        |c AS (SELECT doc_id, toks, n_tokens,
        |             unnest(generate_series(0, n_tokens - 1, 32)) AS start
        |      FROM n),
        |ch AS (SELECT doc_id, cast(start // 32 AS bigint) AS chunk_id,
        |              md5(array_to_string(toks[start + 1 : start + 32], ' ')) AS chunk_hash
        |       FROM c)
        |SELECT doc_id, chunk_id, chunk_hash,
        |       (row_number() OVER (PARTITION BY chunk_hash
        |                           ORDER BY doc_id, chunk_id) = 1) AS keep
        |FROM ch ORDER BY doc_id, chunk_id""".stripMargin,
    "q_seq_pack" ->
      """WITH t AS (SELECT doc_id,
        |                  cast(len(string_split(text, ' ')) AS bigint) AS n_tokens,
        |                  doc_id // 100 AS block
        |           FROM documents),
        |c AS (SELECT doc_id, block, n_tokens,
        |             cast(sum(n_tokens) OVER (PARTITION BY block ORDER BY doc_id
        |                                      ROWS UNBOUNDED PRECEDING) AS bigint)
        |               AS cum_tokens
        |      FROM t)
        |SELECT doc_id, block, (cum_tokens - n_tokens) // 2048 AS bin,
        |       n_tokens, cum_tokens
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_seq_emit" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
        |                  doc_id // 100 AS block
        |           FROM documents),
        |n AS (SELECT doc_id, toks, block,
        |             cast(len(toks) AS bigint) AS n_tokens FROM t),
        |c AS (SELECT doc_id, toks, block, n_tokens,
        |             cast(sum(n_tokens) OVER (PARTITION BY block ORDER BY doc_id
        |                                      ROWS UNBOUNDED PRECEDING) AS bigint)
        |               AS cum
        |      FROM n),
        |b AS (SELECT doc_id, toks, block, cum, cum - n_tokens AS s,
        |             unnest(generate_series((cum - n_tokens) // 2048,
        |                                    (cum - 1) // 2048)) AS bin
        |      FROM c),
        |sp AS (SELECT block, bin, doc_id, s, toks,
        |              greatest(s, bin * 2048) AS span_start,
        |              least(cum, (bin + 1) * 2048) AS span_end
        |       FROM b)
        |SELECT block, cast(bin AS bigint) AS bin, doc_id,
        |       cast(span_start - s AS bigint) AS doc_offset,
        |       cast(span_start - bin * 2048 AS bigint) AS bin_offset,
        |       cast(span_end - span_start AS bigint) AS span_tokens,
        |       array_to_string(toks[span_start - s + 1 : span_end - s], ' ')
        |         AS span_text
        |FROM sp ORDER BY block, bin, bin_offset, doc_id""".stripMargin,
    "q_stratified_sample" ->
      s"""SELECT doc_id, lang, source, n_chars FROM documents
         |WHERE ${hashDrawDuck("doc_id")} % 5 = 0
         |ORDER BY doc_id""".stripMargin,
    "q_data_split" ->
      s"""SELECT doc_id, lang,
         |       CASE WHEN ${hashDrawDuck("doc_id")} % 100 < 90 THEN 'train'
         |            WHEN ${hashDrawDuck("doc_id")} % 100 < 95 THEN 'val'
         |            ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_split_leakage" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |n AS (SELECT doc_id, toks, len(toks) AS n_tokens FROM t),
         |c AS (SELECT doc_id, toks, n_tokens,
         |             unnest(generate_series(0, n_tokens - 1, 32)) AS start
         |      FROM n),
         |ch AS (SELECT doc_id,
         |              md5(array_to_string(toks[start + 1 : start + 32], ' ')) AS chunk_hash,
         |              CASE WHEN ${hashDrawDuck("doc_id")} % 100 < 90 THEN 'train'
         |                   WHEN ${hashDrawDuck("doc_id")} % 100 < 95 THEN 'val'
         |                   ELSE 'test' END AS split
         |       FROM c)
         |SELECT chunk_hash, count(*) AS n_copies,
         |       cast(count(DISTINCT split) AS bigint) AS n_splits,
         |       min(doc_id) AS keep_id,
         |       cast(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS bigint) AS n_train,
         |       cast(sum(CASE WHEN split != 'train' THEN 1 ELSE 0 END) AS bigint) AS n_eval
         |FROM ch GROUP BY chunk_hash HAVING count(DISTINCT split) > 1
         |ORDER BY chunk_hash""".stripMargin,
    "q_pii_scrub" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |       cast(len(toks) AS bigint) AS n_tokens,
        |       cast(len(list_filter(toks, t -> t LIKE '%@%')) AS bigint) AS n_emails,
        |       cast(len(list_filter(toks, t -> NOT (t LIKE '%@%') AND length(t) >= 7
        |              AND translate(t, '0123456789', '') = '')) AS bigint) AS n_phones,
        |       array_to_string(list_transform(toks, t ->
        |         CASE WHEN t LIKE '%@%' THEN '<EMAIL>'
        |              WHEN length(t) >= 7 AND translate(t, '0123456789', '') = ''
        |              THEN '<PHONE>' ELSE t END), ' ') AS scrubbed
        |FROM t ORDER BY doc_id""".stripMargin,
    "q_group_sample" ->
      s"""WITH d AS (
         |  SELECT lang, doc_id, ${hashDrawDuck("doc_id")} AS draw
         |  FROM documents)
         |SELECT lang,
         |       cast(row_number() OVER (PARTITION BY lang
         |                               ORDER BY draw ASC, doc_id ASC) AS int) AS rk,
         |       doc_id, draw
         |FROM d QUALIFY rk <= 10
         |ORDER BY lang, rk""".stripMargin,
    // sample_k is semantically invisible: the custom aggregate keeps
    // exactly the window form's first k per stratum, so the oracle is
    // q_group_sample's, verbatim.
    "q_sample_agg" ->
      s"""WITH d AS (
         |  SELECT lang, doc_id, ${hashDrawDuck("doc_id")} AS draw
         |  FROM documents)
         |SELECT lang,
         |       cast(row_number() OVER (PARTITION BY lang
         |                               ORDER BY draw ASC, doc_id ASC) AS int) AS rk,
         |       doc_id, draw
         |FROM d QUALIFY rk <= 10
         |ORDER BY lang, rk""".stripMargin,
    "q_group_topk" ->
      """SELECT doc_id, lang, source, n_chars,
        |       cast(row_number() OVER (PARTITION BY lang, source
        |                               ORDER BY n_chars DESC, doc_id) AS int) AS rk
        |FROM documents
        |QUALIFY rk <= 3
        |ORDER BY lang, source, rk""".stripMargin,
    "q_decontaminate" ->
      """WITH fp AS (SELECT doc_id, lang, md5(text) AS h FROM documents),
        |ev AS (SELECT DISTINCT h FROM fp WHERE doc_id % 97 = 0)
        |SELECT doc_id, lang FROM fp
        |WHERE h NOT IN (SELECT h FROM ev)
        |ORDER BY doc_id""".stripMargin,
    "q_decontaminate_ngram" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(toks) - ${NgramSize - 1}, 1) + 1), i -> array_to_string(toks[i:i+${NgramSize - 1}], ' '))) AS shingles FROM t),
         |h AS (SELECT doc_id, list_distinct(list_transform(shingles, s -> ${LlmQueries.h60Duck("s")})) AS hs FROM sh),
         |tr AS (SELECT doc_id, unnest(hs) AS g, len(hs) AS n_grams FROM h
         |       WHERE doc_id % $EvalMod <> 0),
         |ev0 AS (SELECT doc_id AS eval_id, unnest(hs) AS g FROM h
         |        WHERE doc_id % $EvalMod = 0),
         |ev AS (SELECT eval_id, g FROM ev0
         |       QUALIFY count(*) OVER (PARTITION BY g) <= $EvalGramMax),
         |ov AS (SELECT tr.doc_id, ev.eval_id, tr.n_grams, count(*) AS n_common
         |       FROM tr JOIN ev ON tr.g = ev.g GROUP BY 1, 2, 3)
         |SELECT doc_id, eval_id, n_common, n_grams,
         |       round(n_common / n_grams, 6) AS overlap
         |FROM ov
         |WHERE round(n_common / n_grams, 6) >= $OverlapThreshold
         |ORDER BY doc_id, eval_id""".stripMargin,
    "q_substring_dedup" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |sh AS (SELECT doc_id, list_transform(range(1, greatest(len(toks) - ${SpanW - 1}, 1) + 1), i -> array_to_string(toks[i:i+${SpanW - 1}], ' ')) AS ws FROM t),
         |p AS (SELECT doc_id, len(ws) AS n_windows,
         |             unnest(range(1, len(ws) + 1)) AS pos,
         |             unnest(list_transform(ws, s -> ${LlmQueries.h60Duck("s")})) AS g
         |      FROM sh),
         |dg AS (SELECT g FROM p GROUP BY g HAVING count(DISTINCT doc_id) > 1),
         |d AS (SELECT doc_id, n_windows, pos FROM p WHERE g IN (SELECT g FROM dg)),
         |i AS (SELECT doc_id, n_windows, pos,
         |             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
         |      FROM d),
         |r AS (SELECT doc_id, max(n_windows) AS n_windows, count(*) AS run
         |      FROM i GROUP BY doc_id, island),
         |a AS (SELECT doc_id, max(n_windows) AS n_windows,
         |             cast(sum(run) AS bigint) AS n_dup, max(run) AS max_run
         |      FROM r GROUP BY doc_id)
         |SELECT doc_id, n_windows, n_dup, max_run,
         |       round(n_dup / n_windows, 6) AS dup_ratio
         |FROM a ORDER BY doc_id""".stripMargin,
    "q_repetition_filter" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |m AS (SELECT doc_id, toks,
         |  list_transform(range(1, greatest(len(toks) - 1, 1) + 1), i -> array_to_string(toks[i:i+1], ' ')) AS g2
         |FROM t),
         |r AS (SELECT doc_id,
         |  cast(len(toks) AS bigint) AS n_tokens,
         |  round(1.0 - len(list_distinct(toks)) / len(toks), 6) AS dup_token_ratio,
         |  round(1.0 - len(list_distinct(g2)) / len(g2), 6) AS dup_2gram_ratio,
         |  round(list_max(list_transform(list_distinct(g2), u -> len(list_filter(g2, x -> x = u)))) / len(g2), 6) AS max_2gram_frac
         |FROM m)
         |SELECT doc_id, n_tokens, dup_token_ratio, dup_2gram_ratio,
         |       max_2gram_frac,
         |       (dup_token_ratio <= $MaxDupTokenRatio AND
         |        dup_2gram_ratio <= $MaxDup2gramRatio AND
         |        max_2gram_frac <= $Max2gramFrac) AS keep
         |FROM r ORDER BY doc_id""".stripMargin,
    "q_domain_mix" ->
      """WITH g AS (
        |  SELECT lang, source, count(*) AS n_docs,
        |         cast(sum(len(string_split(text, ' '))) AS bigint) AS n_tokens
        |  FROM documents GROUP BY 1, 2),
        |t AS (SELECT cast(sum(n_tokens) AS bigint) AS _total FROM g)
        |SELECT lang, source, n_docs, n_tokens,
        |       round(sqrt(n_tokens / _total), 6) AS weight
        |FROM g, t
        |ORDER BY lang, source""".stripMargin,
    "q_common_ngrams" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(toks) - 4, 1) + 1), i -> array_to_string(toks[i:i+4], ' '))) AS shingles FROM t),
         |h AS (SELECT doc_id, list_distinct(list_transform(shingles, s -> ${LlmQueries.h60Duck("s")})) AS hs FROM sh),
         |g AS (SELECT unnest(hs) AS gram FROM h)
         |SELECT gram, count(*) AS df FROM g
         |GROUP BY 1 ORDER BY df DESC, gram LIMIT 20""".stripMargin,
    "q_weighted_sample" ->
      s"""WITH g AS (
         |  SELECT lang, source,
         |         cast(sum(len(string_split(text, ' '))) AS bigint) AS n_tokens
         |  FROM documents GROUP BY 1, 2),
         |t AS (SELECT cast(sum(n_tokens) AS bigint) AS _total FROM g),
         |w AS (SELECT lang, source,
         |             cast(round(sqrt(n_tokens / _total) * 1000000) AS bigint) AS thresh
         |      FROM g, t)
         |SELECT d.doc_id, d.lang, d.source, w.thresh
         |FROM documents d JOIN w USING (lang, source)
         |WHERE ${hashDrawDuck("d.doc_id")} % 1000000 < w.thresh
         |ORDER BY d.doc_id""".stripMargin,
    "q_curation_pipeline" ->
      s"""WITH t AS (SELECT doc_id, lang, text, string_split(text, ' ') AS toks FROM documents),
         |m AS (SELECT doc_id, lang, text, toks,
         |  list_transform(range(1, greatest(len(toks) - 1, 1) + 1), i -> array_to_string(toks[i:i+1], ' ')) AS g2
         |FROM t),
         |r AS (SELECT doc_id, lang, text,
         |  cast(len(toks) AS bigint) AS n_tokens,
         |  round(1.0 - len(list_distinct(toks)) / len(toks), 6) AS dup_token_ratio,
         |  round(1.0 - len(list_distinct(g2)) / len(g2), 6) AS dup_2gram_ratio,
         |  round(list_max(list_transform(list_distinct(g2), u -> len(list_filter(g2, x -> x = u)))) / len(g2), 6) AS max_2gram_frac
         |FROM m),
         |rk AS (SELECT doc_id, lang, n_tokens FROM r
         |       WHERE n_tokens >= 20 AND dup_token_ratio <= $MaxDupTokenRatio
         |         AND dup_2gram_ratio <= $MaxDup2gramRatio
         |         AND max_2gram_frac <= $Max2gramFrac),
         |k AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text))
         |SELECT lang, count(*) AS n_docs, cast(sum(n_tokens) AS bigint) AS n_tokens
         |FROM rk JOIN k USING (doc_id)
         |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_training_pipeline" ->
      s"""WITH t AS (SELECT doc_id, lang, text, string_split(text, ' ') AS toks FROM documents),
         |m AS (SELECT doc_id, lang, text, toks,
         |  list_transform(range(1, greatest(len(toks) - 1, 1) + 1), i -> array_to_string(toks[i:i+1], ' ')) AS g2
         |FROM t),
         |r AS (SELECT doc_id, lang, text,
         |  cast(len(toks) AS bigint) AS n_tokens,
         |  round(1.0 - len(list_distinct(toks)) / len(toks), 6) AS dup_token_ratio,
         |  round(1.0 - len(list_distinct(g2)) / len(g2), 6) AS dup_2gram_ratio,
         |  round(list_max(list_transform(list_distinct(g2), u -> len(list_filter(g2, x -> x = u)))) / len(g2), 6) AS max_2gram_frac
         |FROM m),
         |rk AS (SELECT doc_id, lang, n_tokens,
         |              cast(${graft.functions.BpeCount.duckExpr("text")} AS bigint) AS n_bpe
         |       FROM r
         |       WHERE n_tokens >= 20 AND dup_token_ratio <= $MaxDupTokenRatio
         |         AND dup_2gram_ratio <= $MaxDup2gramRatio
         |         AND max_2gram_frac <= $Max2gramFrac),
         |k AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         |ev AS (SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 97 = 0),
         |cl AS (SELECT doc_id FROM documents
         |       WHERE md5(text) NOT IN (SELECT fp FROM ev)),
         |sv AS (SELECT rk.doc_id, lang, n_tokens, n_bpe,
         |              CASE WHEN ${hashDrawDuck("rk.doc_id")} % 100 < 90 THEN 'train'
         |                   WHEN ${hashDrawDuck("rk.doc_id")} % 100 < 95 THEN 'val'
         |                   ELSE 'test' END AS split
         |       FROM rk JOIN k USING (doc_id) JOIN cl USING (doc_id)),
         |ch AS (SELECT split, lang, n_tokens, n_bpe,
         |              cast(len(generate_series(0, n_tokens - 1, 48)) AS bigint) AS n_chunks,
         |              cast(list_sum(list_transform(generate_series(0, n_tokens - 1, 48),
         |                st -> least(64, n_tokens - st))) AS bigint) AS chunk_tokens
         |       FROM sv)
         |SELECT split, lang, count(*) AS n_docs,
         |       cast(sum(n_chunks) AS bigint) AS n_chunks,
         |       cast(sum(chunk_tokens) AS bigint) AS n_tokens,
         |       cast(sum(n_bpe) AS bigint) AS n_bpe_tokens
         |FROM ch GROUP BY split, lang ORDER BY split, lang""".stripMargin,
    "q_epoch_shuffle" ->
      s"""WITH t AS (SELECT doc_id, ${epochDrawDuck("doc_id", 7)} AS draw
         |           FROM documents),
         |sh AS (SELECT doc_id, draw, cast(draw % 8 AS int) AS shard FROM t)
         |SELECT doc_id, shard,
         |       cast(row_number() OVER (PARTITION BY shard
         |         ORDER BY draw, doc_id) - 1 AS bigint) AS pos,
         |       draw
         |FROM sh ORDER BY shard, pos""".stripMargin
  )
}
