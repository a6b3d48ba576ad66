package graft.api

import graft.cdc.{CdcConfig, CdcSession}
import graft.operators.{AsOfJoin, CdcQueries, CorpusOps, DedupClusters, FuzzyJoin, LlmQueries, ScaleOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The library's public, parameterized operator surface.
  *
  * The driver-checked queries in `graft.operators` bind these operations
  * to the test corpus with fixed columns; real users bring their own
  * tables and column names. Everything here is a plain DataFrame
  * transformation — no collect, no UDFs — so Catalyst keeps pushdown,
  * AQE, and whole-stage codegen, and the 100 TB plan shapes documented in
  * SURVEY §7.1a (single-shuffle aggs, LSH equi-joins instead of
  * all-pairs, broadcast-bounded dims) carry over unchanged.
  *
  * The CDC lifecycle (connect → enable → activate → stream) lives on
  * [[graft.cdc.CdcSession]]; streaming materialization on
  * [[graft.streaming.CdcPipeline]]. This object is the batch/corpus API.
  */
object Graft {

  /** Exact dedup groups: one row per distinct text, with the keeper id
    * (minimum) and the duplicate count. Single hash aggregation. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol).cast("binary")).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Near-duplicate pairs via seeded MinHash + LSH banding: word 3-gram
    * shingles → 60-bit hashes → 16-perm signature (one native pass) → 4
    * bands → candidate pairs share a band key (equi-join, never
    * all-pairs) → exact Jaccard over the hash sets verifies. */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.7): DataFrame = {
    graft.functions.TextHash.ensureRegistered(docs.sparkSession)
    LlmQueries.minhashNearDupPairs(docs, idCol, textCol, threshold)
  }

  /** Brute-force cosine top-k against one query vector: a linear scan
    * scored by the codegen'd `dot_f32` kernel, TakeOrderedAndProject —
    * the exact baseline; see q_ann_ivf for the IVF scale path. */
  def cosineTopK(vectors: DataFrame, idCol: String, vecCol: String,
                 query: Array[Float], k: Int): DataFrame = {
    graft.functions.DotF32.ensureRegistered(vectors.sparkSession)
    val qNorm = math.sqrt(query.map(x => x.toDouble * x).sum)
    vectors
      .withColumn("_q", typedlit(query))
      .withColumn("sim", expr(
        s"dot_f32($vecCol, _q) / (sqrt(dot_f32($vecCol, $vecCol)) * $qNorm)"))
      .drop("_q")
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Scalar (int8) vector quantization for storage/bandwidth: each
    * vector becomes `round(x·127/max|x|)` plus its per-vector `scale` —
    * a quarter of float32's bytes on the 100 TB scan, which is the real
    * bottleneck of brute-force similarity. Quantized values are exact
    * small integers stored as float, so downstream cosine ranking stays
    * on the codegen'd `dot_f32` kernel and the scale cancels out of the
    * quantized cosine entirely (see q_quantized_topk). Returns
    * (`idCol`, qvec, scale); dequantize as `qvec·scale/127`. */
  def quantizeVectors(vectors: DataFrame, idCol: String, vecCol: String): DataFrame =
    vectors
      .withColumn("_scale", expr(s"array_max(transform($vecCol, x -> abs(double(x))))"))
      .select(col(idCol),
        expr(s"CASE WHEN _scale = 0 THEN transform($vecCol, x -> cast(0 AS float)) " +
          s"ELSE transform($vecCol, x -> cast(round(double(x) * 127 / _scale) AS float)) END")
          .as("qvec"),
        col("_scale").as("scale"))

  /** As-of join: latest `right` row at-or-before each `left` timestamp
    * per key — union + one window pass, no range-join explosion. See
    * [[graft.operators.AsOfJoin.asOf]] for semantics. */
  def asOf(left: DataFrame, right: DataFrame, key: Seq[String],
           leftTs: String, rightTs: String,
           rightPayload: Seq[String]): DataFrame =
    AsOfJoin.asOf(left, right, key, leftTs, rightTs, rightPayload)

  /** Incremental near-dup discovery: near-dup pairs TOUCHING `newIds` (a
    * one-column frame of the incoming batch's ids) — batch×corpus and
    * batch×batch, never corpus×corpus. The probe side of the LSH band
    * join is the batch's bands alone, so an incoming crawl batch
    * deduplicates against an accumulated corpus at |batch| × bucket cost
    * instead of re-pairing everything ingested so far. */
  /** SimHash near-duplicate pairs: 32-bit fingerprint, 4×8-bit hamming-LSH
    * bands (equi-join, never all-pairs), verified at `bit_count(a ^ b) <=
    * maxHamming`. `maxHamming` <= 3 is lossless by pigeonhole (<= 3 flipped
    * bits leave >= 1 of 4 bands identical). Cheaper than MinHash (one
    * token-hash pass, no shingle sets) and catches a different change
    * profile: token-frequency preserving edits. `wide = true` is the
    * 100 TB form: the 60-bit `simhash60` kernel with 4×15-bit bands —
    * 4×32 768 buckets, ~128× less candidate fan-in, same plan shape and
    * the same pigeonhole guarantee. */
  def simhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                          maxHamming: Int = 3, wide: Boolean = false): DataFrame = {
    graft.functions.TextHash.ensureRegistered(docs.sparkSession)
    LlmQueries.simhashNearDupPairs(docs, idCol, textCol, maxHamming, wide)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def nearDupPairsIncremental(docs: DataFrame, idCol: String, textCol: String,
                              newIds: DataFrame,
                              threshold: Double = 0.7): DataFrame = {
    graft.functions.TextHash.ensureRegistered(docs.sparkSession)
    LlmQueries.minhashPairsTouching(docs, idCol, textCol, newIds, threshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** The persistable near-dup signature index for continuous ingestion:
    * one row per (doc, band) — (`idCol`, hs, band, bkey). Write this once
    * (and append each accepted batch's rows), then deduplicate every
    * incoming crawl batch with the index overload of
    * [[nearDupPairsIncremental]] — the corpus TEXT is scanned exactly
    * once, at index-build time, never again per batch. For a STREAMING
    * ingestion pipeline, [[graft.streaming.DedupStream]] runs the whole
    * loop (probe batch → log pairs → append accepted signatures) as a
    * foreachBatch stage with exactly-once appends. */
  def signatureIndex(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.TextHash.ensureRegistered(docs.sparkSession)
    LlmQueries.signatureIndexCore(docs, idCol, textCol)
      .withColumnRenamed("doc_id", idCol)
  }

  /** Incremental near-dup discovery against a PERSISTED [[signatureIndex]]
    * (typically read back from parquet): shingles/signatures are computed
    * only for `batch`; the index contributes its stored bands and hash
    * sets, so a crawl batch deduplicates against 100 TB of accumulated
    * corpus at |batch| × bucket cost with zero corpus text scanned.
    * Finds batch×corpus and batch×batch pairs (never corpus×corpus); a
    * batch id already present in the index supersedes its index rows.
    * `idCol`/`textCol` address the batch frame; the index must carry the
    * same `idCol` name (as [[signatureIndex]] emits). */
  def nearDupPairsIncremental(index: DataFrame, batch: DataFrame,
                              idCol: String, textCol: String,
                              threshold: Double): DataFrame = {
    graft.functions.TextHash.ensureRegistered(batch.sparkSession)
    LlmQueries.minhashPairsAgainstIndex(index, batch, idCol, textCol, threshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** [[nearDupPairsIncremental]] directly against a STREAMED index
    * DIRECTORY (the [[graft.streaming.DedupStream]]/`ClusterStream`
    * two-store layout: `bb=`-bucketed band rows + the `_ids` hs/id
    * sidecar) — the bucket-PRUNED probe path: the collision read
    * touches only the `bb` partitions the batch's own band rows name
    * and the Jaccard verify only the candidate docs' `ib` sidecar
    * buckets, so an ad-hoc batch probe between stream runs costs the
    * same as the stream's own per-micro-batch step. Reconstructing the
    * legacy frame via [[graft.streaming.DedupStream.readIndex]] and
    * calling the DataFrame overload instead would scan and join the
    * whole index. Read-only: nothing is appended; run it against a live
    * index between batches (same single-writer discipline as
    * compaction). */
  def nearDupPairsIncremental(spark: SparkSession, indexDir: String,
                              batch: DataFrame, idCol: String,
                              textCol: String, threshold: Double): DataFrame = {
    graft.functions.TextHash.ensureRegistered(spark)
    // Long.MinValue as the excluded batch id: no stream batch (>= 0) or
    // compacted partial (small negative) ever carries it, so nothing is
    // masked from the probe.
    graft.streaming.DedupStream.probePairs(spark, indexDir, idCol,
        LlmQueries.minhashMaterialized(batch, idCol, textCol), threshold,
        excludeBatch = Long.MinValue)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Embedding-space near-duplicate pairs via a sign-sketch LSH bucket
    * join: vectors are bucketed by an `planes`-bit hyperplane sign
    * sketch (planes = the `planes` lowest-`idCol` embeddings), pairs are
    * generated only within a bucket — an equi-join, never all-pairs —
    * and verified at cosine >= `threshold`. Returns (vec_a, vec_b, sim).
    * Widen `planes` as the corpus grows: expected bucket size scales as
    * n / 2^planes for near-orthogonal data, and the sketch only buckets —
    * the cosine check keeps precision, so extra planes trade recall for
    * join fan-out. 4 planes suit the test SF; 16+ a production corpus. */
  def embNearDupPairs(vectors: DataFrame, idCol: String, vecCol: String,
                      planes: Int = 16, threshold: Double = 0.9): DataFrame =
    LlmQueries.embNearDupPairsCore(vectors, idCol, vecCol, planes, threshold)
      .orderBy(col("vec_a"), col("vec_b"))

  /** Duplicate clustering: near-dup pair discovery (the MinHash+LSH
    * pipeline of [[nearDupPairs]]) closed under transitive connectivity —
    * every document labeled with its cluster's canonical id (the minimum
    * id in its connected component), the cluster size, and a `keep` flag
    * on the one representative to retain. Distributed min-label
    * propagation with pointer jumping ([[ConnectedComponents]]); the edge
    * list is only the LSH candidate pairs, never all-pairs. */
  def dupClusters(docs: DataFrame, idCol: String, textCol: String,
                  threshold: Double = 0.7): DataFrame =
    DedupClusters.clusters(docs, idCol, textCol, threshold)

  /** Sketch-only distinct count per group (HyperLogLog++,
    * `approx_count_distinct`): ONE pass, fixed-size mergeable state,
    * map-side combine — the only viable distinct count at 100 TB for
    * high-cardinality keys. Relative error ~`rsd`. The driver query
    * `q_approx_distinct` is the oracle-checked form carrying an exact
    * ride-along; this is the production form. */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     rsd: Double = 0.02): DataFrame = {
    val agg = approx_count_distinct(col(valueCol), rsd).as(s"approx_distinct_$valueCol")
    if (groupCols.isEmpty) df.agg(agg)
    else df.groupBy(groupCols.map(col): _*).agg(agg)
  }

  /** Sketch-only quantiles per group (Greenwald-Khanna,
    * `approx_percentile`): ONE pass, mergeable per-partition state, rank
    * error ≤ n/`accuracy` — vs the exact percentile's per-group full value
    * buffer, which is the OOM at scale. One output column per requested
    * percentile (`p50`, `p90`, … by percentage). The driver query
    * `q_approx_quantiles` is the oracle-checked form with exact
    * ride-alongs; this is the production form. */
  def approxQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                      percentages: Seq[Double],
                      accuracy: Int = 10000): DataFrame = {
    require(percentages.nonEmpty, "at least one percentage")
    val aggs: Seq[Column] = percentages.map { p =>
      // decimal-string construction BEFORE scaling: BigDecimal(0.07 * 100)
      // would bake the double artifact 7.000000000000001 into the name
      val nm = "p" + (BigDecimal(p.toString) * 100).underlying
        .stripTrailingZeros.toPlainString.replace(".", "_")
      expr(s"approx_percentile($valueCol, $p, $accuracy)").as(nm)
    }
    if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Reproducible 1-in-`keepOneIn` sample stratified by an integral key:
    * a map-side integer-exact filter (no shuffle, no rand()) any engine
    * recomputes identically. The draw reduces the key into [0, 2^31)
    * before the multiply, so it stays exact for ANY long key — including
    * negative ids and 60-bit hash fingerprints. */
  def stratifiedSample(df: DataFrame, keyCol: String, keepOneIn: Int): DataFrame =
    df.filter(CorpusOps.hashDraw(col(keyCol)) % keepOneIn === 0)

  /** Decontamination: drop rows of `train` whose exact `textCol` content
    * appears in `evalSet` — fingerprint left-anti join (catches
    * duplicates of eval texts under different ids). */
  def decontaminate(train: DataFrame, evalSet: DataFrame,
                    textCol: String): DataFrame = {
    val evalFps = evalSet.select(md5(col(textCol).cast("binary")).as("_fp")).distinct()
    train.withColumn("_fp", md5(col(textCol).cast("binary")))
      .join(evalFps, Seq("_fp"), "left_anti")
      .drop("_fp")
  }

  /** Batch MERGE (SURVEY M3, the change-apply the streaming sink performs
    * incrementally): latest change per key wins by `seqCol`; rows whose
    * winner is a delete drop out; a `truncate` verb wipes every row at or
    * below its `seqCol` position (table-level, like CDC_REC_TRUNCATE).
    * `base` rows participate with their own `seqCol` value, and `changes`
    * may carry an `op` column with `upsert`/`delete`/`truncate` verbs
    * (absent ⇒ all upserts). */
  def applyChanges(base: DataFrame, changes: DataFrame, key: Seq[String],
                   seqCol: String): DataFrame = {
    def withOp(df: DataFrame) =
      if (df.columns.contains("op")) df else df.withColumn("op", lit("upsert"))
    val all = withOp(base).unionByName(withOp(changes))
    // Truncate high-water computed IN-PLAN: a 1-row aggregate broadcast
    // onto every row (one extra scan of the union, both lazy — no eager
    // driver action inside a pure-API function). When no truncate verb is
    // present the watermark is null and every row survives this stage.
    val truncT = all
      .agg(max(when(col("op") === "truncate", col(seqCol))).as("_trunc_t"))
    val current = all.crossJoin(broadcast(truncT))
      .filter(col("_trunc_t").isNull ||
        (col("op") =!= "truncate" && col(seqCol) > col("_trunc_t")))
      .drop("_trunc_t")
    val merged = current
      .withColumn("_rn", row_number().over(
        Window.partitionBy(key.map(col): _*).orderBy(col(seqCol).desc)))
      .filter(col("_rn") === 1).drop("_rn")
    merged.filter(col("op") === "upsert").drop("op")
  }

  /** SCD Type-2 history from a change stream: per key (ordered by
    * `seqCol`) collapse consecutive duplicate `valueCol` images (a
    * re-delivered identical image opens no new version) and emit one row
    * per surviving version with `version`, `valid_from_seq`,
    * `valid_to_seq` (NULL while current) and `is_current` (0/1) — the
    * keep-every-version counterpart of [[applyChanges]]' latest-wins
    * MERGE. One shuffle on the key; both window passes stack on it. */
  def scd2History(changes: DataFrame, keyCol: String, seqCol: String,
                  valueCol: String): DataFrame =
    CdcQueries.scd2History(changes, keyCol, seqCol, valueCol)

  /** Domain-mixing weights for training-data sampling: per stratum
    * (`strata` grouping columns), the doc/token counts and a sub-linear
    * α=0.5 sampling weight `round(sqrt(stratum_tokens / total_tokens),
    * 6)` — up-weights small domains without letting one giant crawl
    * dominate. Exact integer sums; one division + one sqrt per stratum
    * (both IEEE-exact, engine-portable — deliberately not `pow`, whose
    * libm drift breaks cross-engine reproducibility). */
  def domainMix(docs: DataFrame, strata: Seq[String], textCol: String): DataFrame =
    CorpusOps.domainMix(docs, strata, textCol)

  /** Reproducible weighted corpus sampling at the [[domainMix]] α=0.5
    * rates: every doc keeps a deterministic multiplicative-hash draw of
    * its integral `idCol` and survives when it lands under its stratum's
    * threshold — no rand(), so the sample is re-derivable across runs,
    * partitionings, and engines, and stable under corpus growth within a
    * stratum's weight. Map-side after one broadcast of the bounded
    * per-stratum thresholds. */
  def weightedSample(docs: DataFrame, strata: Seq[String], idCol: String,
                     textCol: String): DataFrame =
    CorpusOps.weightedSample(docs, strata, idCol, textCol).drop("_thresh")

  /** Corpus-level boilerplate detection: the `k` most document-frequent
    * word `n`-gram hashes (repeated header/footer/license spans to strip
    * before training). Shingles come pre-deduped per doc from the fused
    * native kernel, so a plain count IS the document frequency; top-k is
    * `orderBy.limit` (TakeOrderedAndProject — never a global sort). */
  def boilerplateNgrams(docs: DataFrame, textCol: String, n: Int = 5,
                        k: Int = 20): DataFrame =
    CorpusOps.boilerplateNgrams(docs, textCol, n, k)

  /** Pre-tokenizer character-class quality signals per document:
    * char/token counts, mean token length, vowel ratio — pure map-side
    * string arithmetic (`translate`, no regex), ratios at 6 dp. */
  def charStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    LlmQueries.charStats(docs, idCol, textCol)

  /** Salient terms per group by a TF-IDF-style score — the rational form
    * tf·N/df (same monotone ranking family as tf·ln(N/df), but
    * exact-integer products with one double division, engine-portable).
    * One explode + two hash aggregates + a broadcast of per-group doc
    * counts + a per-group top-`k` window; the shuffle carries
    * (group, token) partials, never raw text. Returns
    * (groupCol, rk, token, tf, df, score). */
  def salientTerms(docs: DataFrame, groupCol: String, idCol: String,
                   textCol: String, k: Int = 10): DataFrame =
    LlmQueries.salientTerms(docs, groupCol, idCol, textCol, k)

  /** Intra-document repetition signals (Gopher/C4-style quality rules):
    * duplicate-token ratio, duplicate-2-gram ratio, and the most common
    * 2-gram's share, per document. Entirely map-side — higher-order array
    * expressions, no shuffle, no explode. Thresholding is policy, so the
    * caller filters; the driver query `q_repetition_filter` shows one
    * threshold set. */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    CorpusOps.repetitionStats(docs, idCol, textCol)

  /** Cross-document duplicated-span detection (fixed-width-window
    * exact-substring dedup): every `w`-token window is hashed map-side;
    * windows appearing in more than one document mark copied passages.
    * Per affected doc: (idCol, n_windows, n_dup, max_run, dup_ratio) —
    * `max_run + w - 1` tokens is the longest copied span a cutter would
    * excise. Intra-document repeats are NOT flagged (see
    * [[repetitionStats]]); text never rides a shuffle. */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                      w: Int = CorpusOps.SpanW): DataFrame =
    CorpusOps.duplicatedSpans(docs, idCol, textCol, w)

  /** Fuzzy (edit-distance ≤ 1) similarity join — entity resolution of
    * dirty string `mentions` against a clean `catalog` via segment
    * (pigeonhole) blocking: candidates come from an equi-join on
    * (length, segment-no, segment), never all-pairs, and the exact
    * `levenshtein` verify runs map-side on candidates only. Lossless
    * (spec-pinned against the brute-force cross join). Returns
    * (menId, catId, dist). */
  def fuzzyJoin(catalog: DataFrame, catId: String, catName: String,
                mentions: DataFrame, menId: String, menName: String): DataFrame =
    FuzzyJoin.editJoin1(catalog, catId, catName, mentions, menId, menName)

  /** Batch entity resolution over a verified link table
    * `pairs(mention_id, entity_id, …)` (e.g. [[fuzzyJoin]] output with
    * its id columns named canonically): clusters entities claimed by a
    * shared mention (CC over the entity projection), assigns every
    * mention its component, and picks the max-support survivor. Returns
    * (mention_id, component, cluster_size, rep_entity). Persist this
    * run's `pairs` and [[erLabels]] to feed [[erIncrement]]. */
  def erResolve(entities: DataFrame, entityId: String,
                pairs: DataFrame): DataFrame =
    FuzzyJoin.resolve(entities, entityId, pairs)

  /** Entity-component labels `(id, comp)` of a link table — the compact
    * persistable connectivity state of a resolution run (one row per
    * entity; the next increment's contraction closure joins new edges
    * against this table and re-closes only the touched components). */
  def erLabels(entities: DataFrame, entityId: String,
               pairs: DataFrame): DataFrame =
    FuzzyJoin.erLabels(entities, entityId, pairs)

  /** Incremental entity resolution: yesterday's persisted state
    * (`oldPairs` link table + `oldLabels` from [[erLabels]]) merged with
    * the NEW batch's link table only — blocking/verify never re-runs on
    * the old corpus; the contraction closure maps the new links to their
    * endpoints' converged components and re-closes the O(batch)
    * component-level graph, so cross-batch merges fall out exactly
    * (increment ≡ recompute, oracle-pinned by `q_er_increment`).
    *
    * Contract: every entity id referenced by `newPairs` must appear in
    * `entities` — the closure seeds labels from `entities`, and an edge
    * whose endpoint is absent from the seeded label table contributes
    * nothing (its merge is dropped, not raised). Same contract as
    * [[clustersIncrement]]'s `nodes`. */
  def erIncrement(entities: DataFrame, entityId: String,
                  oldPairs: DataFrame, oldLabels: DataFrame,
                  newPairs: DataFrame): DataFrame =
    FuzzyJoin.resolveIncrement(entities, entityId, oldPairs, oldLabels,
      newPairs)

  /** Retraction (takedown) from persisted ER state: remove `deleted`
    * mentions; only the components a deleted mention touched re-close
    * (from kept links — deletions can SPLIT components), everything
    * else keeps its label verbatim. Cost follows the deletion, not the
    * corpus; retraction ≡ recompute-on-survivors, oracle-pinned by
    * `q_er_retract`. */
  def erRetract(entities: DataFrame, entityId: String,
                oldPairs: DataFrame, oldLabels: DataFrame,
                deleted: DataFrame, delCol: String): DataFrame =
    FuzzyJoin.resolveRetract(entities, entityId, oldPairs, oldLabels,
      deleted, delCol)

  /** Retraction (takedown) from maintained dedup-cluster state: remove
    * `deleted` documents; only the components containing a deleted doc
    * re-close from their kept pairs (a deleted bridge doc splits its
    * cluster), every other label survives verbatim. Exact because pair
    * discovery is per-pair; oracle-pinned by `q_cluster_retract`. */
  def clustersRetract(labels: DataFrame, idCol: String, pairs: DataFrame,
                      srcCol: String, dstCol: String, deleted: DataFrame,
                      delCol: String): DataFrame =
    DedupClusters.clustersRetract(labels, idCol, pairs, srcCol, dstCol,
      deleted, delCol)

  /** Grouped deterministic bottom-k sampling through the custom
    * [[graft.functions.SampleK]] Catalyst aggregate: per `strata` group,
    * the `k` rows with the smallest (hashDraw(id), id) — reservoir-
    * sampling semantics without rand(), identical to [[groupSample]]'s
    * window form, but with k-BOUNDED map-side partial buffers: the
    * shuffle carries |mappers|·|strata|·k fixed-width pairs regardless
    * of corpus size, and no per-group sort runs. Returns
    * (strata..., rk, idCol, draw). */
  def sampleAgg(docs: DataFrame, strata: Seq[String], idCol: String,
                k: Int): DataFrame =
    CorpusOps.sampleAgg(docs, strata, idCol, k)

  /** Bigram-LM quality score (the CCNet/Gopher perplexity-filter step):
    * train add-one-smoothed bigram counts on `docs` itself, score each
    * document by average negative log-likelihood per bigram, in integer
    * micro-nats so the result is partitioning-independent. LOW `avg_nll`
    * = corpus-typical (templated/boilerplate), HIGH = unusual or garbled;
    * the filter threshold is the caller's policy. Count tables join back
    * on their gram keys (co-partitioned equi-joins, never broadcast);
    * only (id, w1, w2) gram rows ride the shuffles, never full text.
    * Returns (idCol, n_bigrams, avg_nll); documents with fewer than two
    * tokens have no bigrams and are absent. */
  def lmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    LlmQueries.lmScore(docs, idCol, textCol)

  /** Per-group embedding outliers: each vector ranked ascending by
    * cosine to its own group's centroid, `k` most-atypical per group —
    * surfaces mislabeled / off-distribution vectors before training.
    * Centroid means use exact-integer micro-unit sums (partitioning-
    * independent); scoring is the codegen'd `dot_f32` against one
    * broadcast of the bounded centroid set. */
  def embOutliers(vectors: DataFrame, idCol: String, vecCol: String,
                  groupCol: String, k: Int): DataFrame =
    LlmQueries.embOutliers(vectors, idCol, vecCol, groupCol, k)

  /** Embedding-space duplicate clustering: [[embNearDupPairs]] closed
    * under transitive connectivity (same distributed min-label +
    * pointer-jump engine as [[dupClusters]]) — semantic dedup's cluster
    * step. Returns (`idCol`, component, cluster_size, keep). */
  def embDupClusters(vectors: DataFrame, idCol: String, vecCol: String,
                     planes: Int = 16, threshold: Double = 0.9): DataFrame =
    DedupClusters.embClusters(vectors, idCol, vecCol, planes, threshold)

  /** BM25 document ranking for a bounded query-term set — lexical
    * retrieval for pulling topical sub-corpora (the search baseline next
    * to [[cosineTopK]]/[[ivfProbe]]). Rational Robertson idf (no ln, so
    * scores hash-reproduce across engines) and per-term scores quantized
    * to integer micro-units before the per-doc sum (order-independent).
    * Returns (doc_id, n_hit, score_micro), top `k`; divide `score_micro`
    * by 10⁶ for the conventional scale. */
  def bm25Rank(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame =
    LlmQueries.bm25Rank(docs, idCol, textCol, terms, k, k1, b)

  /** Tokenize a corpus into the maintained inverted-index state:
    * `(postings(doc_id, token, tf, dl, tb), doclens(doc_id, dl))`.
    * Postings carry the document length `dl` denormalized into the row
    * (impact-style — serving never joins doclens) and their `tb` token
    * bucket (`crc32(token) mod B`, B=16 here); persist postings `partitionBy(tb)`
    * so a query's scan partition-prunes to its terms' buckets. ADD a
    * batch by appending its own `bm25Index` rows, DELETE one by
    * anti-joining on the id — both exact with no rescoring, because
    * every global in the BM25 formula (df, n_docs, total_dl) is an
    * additive count [[bm25Serve]] derives at query time. Streaming
    * ingest: [[graft.streaming.Bm25Stream]]. */
  def bm25Index(docs: DataFrame, idCol: String,
                textCol: String): (DataFrame, DataFrame) =
    graft.operators.RetrievalIndex.tokenize(
      docs.selectExpr(s"$idCol AS doc_id", s"$textCol AS text"))

  /** Serve a BM25 query from [[bm25Index]]-maintained state — identical
    * arithmetic (and results) to [[bm25Rank]] over the equivalent
    * corpus. The postings side reads only the query terms' rows (filter
    * the persisted layout's `tb=` buckets first for a partition-pruned
    * scan); doclens feeds only the 1-row (n_docs, total_dl) aggregate —
    * keep that pair maintained additively at scale and serving never
    * scans a corpus-sized table. */
  def bm25Serve(postings: DataFrame, doclens: DataFrame,
                terms: Seq[String], k: Int,
                k1: Double = 1.2, b: Double = 0.75): DataFrame =
    LlmQueries.bm25ScoreStatsDl(
      postings.filter(col("token").isin(terms.distinct: _*))
        .select("doc_id", "token", "tf", "dl"),
      graft.operators.RetrievalIndex.statsOf(doclens), k, k1, b)

  /** Context-window chunking: each document's token stream cut into
    * windows of `window` tokens overlapping by `overlap` — trainer/RAG
    * passage shaping. Map-side explode, no shuffle; returns (doc_id,
    * chunk_id, start, chunk_tokens, chunk_text). */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
                window: Int = 512, overlap: Int = 64): DataFrame =
    CorpusOps.chunkDocs(docs, idCol, textCol, window, overlap)

  /** Sequence packing (concat-then-split) into `windowTokens`-token
    * training bins, packed independently per `blockDocs`-id block so the
    * prefix sum is a block-local window (one bounded shuffle), never a
    * global-order window. Requires numeric ids; returns (doc_id, block,
    * bin, n_tokens, cum_tokens). */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    windowTokens: Int = 4096, blockDocs: Int = 10000): DataFrame =
    CorpusOps.packSequences(docs, idCol, textCol, windowTokens, blockDocs)

  /** Packed-sequence emission: the trainer rows [[packSequences]] only
    * labels — each (bin × doc) overlap as (block, bin, doc_id,
    * doc_offset, bin_offset, span_tokens, span_text), with docs carrying
    * over across bin boundaries so every bin concatenates (in
    * `bin_offset` order) to exactly `windowTokens` tokens except each
    * block's last. Same single block-local window as packSequences plus
    * a map-side explode into the bins each doc touches. */
  def emitPackedSequences(docs: DataFrame, idCol: String, textCol: String,
                          windowTokens: Int = 4096,
                          blockDocs: Int = 10000): DataFrame =
    CorpusOps.emitPackedSequences(docs, idCol, textCol, windowTokens, blockDocs)

  /** IVF bucket assignment: label every vector (unique `idCol`) with the
    * id of its max-cosine centroid as a `cluster` column. Centroids are a
    * bounded set — they ride one broadcast; scoring is the codegen'd
    * `dot_f32` kernel; the cosine rounds to 6 dp BEFORE the argmax and
    * ties break on the lower centroid id — the one assignment convention
    * every engine path shares ([[graft.operators.LlmQueries.kmeansAssign]]'s,
    * which the DuckDB oracles replay), so an index built here, maintained
    * by [[graft.streaming.VectorIndexStream]], and replayed by an oracle
    * can never drift on a near-tie. */
  def ivfAssign(vectors: DataFrame, idCol: String, vecCol: String,
                centroids: DataFrame, cidCol: String,
                cvecCol: String): DataFrame =
    // MAP-SIDE argmax (r18, guide §2.3/§2.4 — see
    // [[graft.operators.LlmQueries.kmeansAssign]], the shared form):
    // the centroid table folds to a 1-row broadcast carrying
    // array<struct<cid, cv, cnorm>> and each vector scores + folds the
    // array in one projection — the previous crossJoin×K + window rank
    // shuffled K copies of every embedding per assignment (one Exchange
    // + Sort, gone). Same rounding, same lower-cid tie-break,
    // NaN-consistent — bit-identical assignments.
    ivfAssignRow(vectors, vecCol,
      ivfCentsRow(vectors.sparkSession, centroids, cidCol, cvecCol))

  /** The centroid table folded to the assignment's 1-row
    * array<struct<cid, cv, cnorm>> frame — split out (r19) so a
    * streaming maintainer can fold ONCE per stream run (and localize it
    * via [[graft.operators.Materialize.local]]) instead of re-running
    * the fold + its broadcast build as fresh jobs every micro-batch. */
  private[graft] def ivfCentsRow(spark: SparkSession, centroids: DataFrame,
      cidCol: String, cvecCol: String): DataFrame = {
    graft.functions.DotF32.ensureRegistered(spark)
    graft.operators.LlmQueries.centroidsRow(
      centroids
        .select(col(cidCol).as("_cid"), col(cvecCol).as("_cv"))
        .withColumn("_cnorm", expr("sqrt(dot_f32(_cv, _cv))")),
      "_cid", "_cv", "_cnorm")
  }

  /** [[ivfAssign]] against a PRE-FOLDED 1-row centroid frame — the
    * per-batch body; bit-identical output to [[ivfAssign]] by
    * construction (same fold, same argmax expression). */
  private[graft] def ivfAssignRow(vectors: DataFrame, vecCol: String,
      centsRow: DataFrame): DataFrame = {
    graft.functions.DotF32.ensureRegistered(vectors.sparkSession)
    vectors
      .withColumn("_norm", expr(s"sqrt(dot_f32($vecCol, $vecCol))"))
      .crossJoin(broadcast(centsRow))
      .withColumn("cluster",
        graft.operators.LlmQueries.bestCentroidExpr(vecCol, "_norm"))
      .drop("_cents", "_norm")
  }

  /** Train IVF centroids: `iters` Lloyd's iterations (max-cosine
    * assignment → exact-integer element-wise means, the [[ivfAssign]]
    * conventions) from a seed of the `k` lowest-`idCol` vectors;
    * `k` = 0 sizes the codebook as K = ⌈√N⌉ — the classic IVF sizing
    * that keeps both the broadcast centroid table and the expected
    * bucket (≈ √N rows) sub-linear in N, so probes and the KNN self-join
    * stay sub-quadratic as the corpus grows. Returns (cid, cv, cnorm) —
    * feed to [[ivfAssign]]/[[ivfMultiProbe]] as the centroid table (cid
    * is the seed vector's id). The iterations unroll into one DAG: each
    * is one K-row broadcast + one (cid, pos) shuffle of exact integer
    * partial sums — the canonical distributed Lloyd's step. */
  def trainIvfCentroids(vectors: DataFrame, idCol: String, vecCol: String,
                        k: Int = 0, iters: Int = 2): DataFrame = {
    require(k >= 0, s"k must be >= 0 (0 = ceil(sqrt(N))), got $k")
    graft.functions.DotF32.ensureRegistered(vectors.sparkSession)
    val e = vectors
      .select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
      .withColumn("norm", expr("sqrt(dot_f32(embedding, embedding))"))
    val kk = if (k > 0) k
      else { // one bounded count job to size the codebook — training is
             // an offline step, and the count result is a single long
        val n = e.count()
        math.max(1, math.ceil(math.sqrt(n.toDouble)).toInt)
      }
    val seed = e.orderBy(col("vec_id")).limit(kk)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"),
        col("norm").as("cnorm"))
    LlmQueries.kmeansTrain(e, seed, iters)
  }

  /** Batched ANN probe over [[ivfAssign]] output: each query searches ONLY
    * its own cluster's bucket (equi-join on `cluster`, query batch on one
    * broadcast), top-`k` by cosine per query — one plan for the whole
    * batch instead of per-query table rescans. Both inputs carry the
    * `cluster` column ivfAssign added. Returns (qid, rank, id, sim). */
  def ivfProbe(assigned: DataFrame, idCol: String, vecCol: String,
               queries: DataFrame, qidCol: String, k: Int): DataFrame = {
    require(qidCol != idCol,
      s"qidCol and idCol are both '$idCol' — rename the query id column " +
        "so the output can carry both")
    graft.functions.DotF32.ensureRegistered(assigned.sparkSession)
    // The query frame keeps ONLY aliased internal columns, so a queries
    // frame sharing the corpus schema (the natural case) can never make
    // the join output ambiguous.
    val q = queries
      .select(col(qidCol).as("_qid"), col("cluster").as("_qcluster"),
        col(vecCol).as("_qv"))
      .withColumn("_qnorm", expr("sqrt(dot_f32(_qv, _qv))"))
    // underscore-prefixed internals throughout (as on the query side), so
    // an assigned frame already carrying sim/rank columns is never
    // silently overwritten mid-computation
    val wq = Window.partitionBy(col("_qid"))
      .orderBy(col("_sim").desc, col(idCol))
    assigned.join(broadcast(q), col("cluster") === col("_qcluster"))
      .withColumn("_sim", expr(
        s"dot_f32($vecCol, _qv) / (sqrt(dot_f32($vecCol, $vecCol)) * _qnorm)"))
      .withColumn("_rank", row_number().over(wq))
      .filter(col("_rank") <= k)
      .select(col("_qid").as(qidCol), col("_rank").as("rank"),
        col(idCol), col("_sim").as("sim"))
  }

  /** Contrastive hard-negative mining over [[ivfAssign]] output: for each
    * anchor in `queries` (which must carry the `cluster` column and a
    * label), the top-`k` most-similar vectors in the anchor's own cell
    * whose `labelCol` DIFFERS from the anchor's — the informative
    * negatives for embedding-model training (random negatives are too
    * easy). Probe cost |anchors| × bucket; the label exclusion rides the
    * bucket equi-join, so same-label rows never enter the top-k window.
    * Returns (qidCol, rank, idCol, labelCol, sim). */
  def hardNegatives(assigned: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, queries: DataFrame, qidCol: String,
                    k: Int): DataFrame =
    LlmQueries.hardNegatives(assigned, idCol, vecCol, labelCol, queries,
      qidCol, k)

  /** Multi-probe ANN over [[ivfAssign]] output: each query probes its
    * `nprobe` nearest centroids' buckets (ranked by cosine, ties on the
    * lower centroid id) instead of only the winner — the recall knob
    * every production IVF exposes, because a query near a Voronoi border
    * has true neighbors just across it. The query batch explodes to
    * |batch| × nprobe rows BEFORE the bucket equi-join (still one
    * broadcast), and the per-query top-`k` window in [[ivfProbe]] spans
    * every probed bucket; a data vector lives in exactly one bucket, so
    * candidates never duplicate. Cost: |batch| × nprobe × bucket. */
  def ivfMultiProbe(assigned: DataFrame, idCol: String, vecCol: String,
                    queries: DataFrame, qidCol: String,
                    centroids: DataFrame, cidCol: String, cvecCol: String,
                    k: Int, nprobe: Int): DataFrame = {
    graft.functions.DotF32.ensureRegistered(assigned.sparkSession)
    val cents = centroids
      .select(col(cidCol).as("_cid"), col(cvecCol).as("_cv"))
      .withColumn("_cnorm", expr("sqrt(dot_f32(_cv, _cv))"))
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("_csim").desc, col("_cid"))
    val expanded = queries
      .select(col(qidCol), col(vecCol))
      .withColumn("_qn", expr(s"sqrt(dot_f32($vecCol, $vecCol))"))
      .crossJoin(broadcast(cents))
      // the ivfAssign rounding convention — query-side cell choice must
      // not drift from the stored assignment on a near-tie
      .withColumn("_csim",
        expr(s"round(dot_f32($vecCol, _cv) / (_qn * _cnorm), 6)"))
      .withColumn("_prn", row_number().over(w))
      .filter(col("_prn") <= nprobe)
      .select(col(qidCol), col(vecCol), col("_cid").as("cluster"))
    ivfProbe(assigned, idCol, vecCol, expanded, qidCol, k)
  }

  /** Persist [[ivfAssign]] output as a partition-pruned ANN index: the
    * vector table laid out as `cluster=<id>` parquet partitions with the
    * centroid table beside it (`_graft_centroids` — the underscore hides
    * it from partition discovery). The layout is the index: a probe
    * lists directories and scans only the partitions its queries name
    * ([[probeVectorIndex]]), so at 100 TB serving cost is per-bucket,
    * never per-corpus. Extra columns on `assigned` (labels, metadata)
    * ride along into the partitions. */
  def writeVectorIndex(assigned: DataFrame, centroids: DataFrame,
                       cidCol: String, cvecCol: String, dir: String): Unit = {
    assigned.write.mode("overwrite").partitionBy("cluster").parquet(dir)
    centroids.select(col(cidCol).as("cid"), col(cvecCol).as("cv"))
      .write.mode("overwrite").parquet(s"$dir/_graft_centroids")
  }

  /** Batched ANN probe over a [[writeVectorIndex]] layout: each query is
    * assigned its `nprobe` nearest STORED centroids (broadcast, tiny),
    * the probed cluster ids collapse to bounded driver metadata
    * (|batch| × nprobe ints), and the scan is partition-pruned to
    * exactly those `cluster=` directories before the [[ivfProbe]] tail
    * runs. Returns (qidCol, rank, idCol, sim). */
  def probeVectorIndex(spark: SparkSession, dir: String, idCol: String,
                       vecCol: String, queries: DataFrame, qidCol: String,
                       k: Int, nprobe: Int = 1): DataFrame = {
    graft.functions.DotF32.ensureRegistered(spark)
    val cents = spark.read.parquet(s"$dir/_graft_centroids")
      .select(col("cid").as("_cid"), col("cv").as("_cv"))
      .withColumn("_cnorm", expr("sqrt(dot_f32(_cv, _cv))"))
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("_csim").desc, col("_cid"))
    val expanded = queries.select(col(qidCol), col(vecCol))
      .withColumn("_qn", expr(s"sqrt(dot_f32($vecCol, $vecCol))"))
      .crossJoin(broadcast(cents))
      // the ivfAssign rounding convention — query-side cell choice must
      // not drift from the stored assignment on a near-tie
      .withColumn("_csim",
        expr(s"round(dot_f32($vecCol, _cv) / (_qn * _cnorm), 6)"))
      .withColumn("_prn", row_number().over(w))
      .filter(col("_prn") <= nprobe)
      .select(col(qidCol), col(vecCol), col("_cid").as("cluster"))
    // Bounded driver metadata (|batch| × nprobe ints), NOT data: the
    // partitions this probe reads — the CDC merge sink's touched-bucket
    // pattern applied to serving.
    val probed = expanded.select(col("cluster")).distinct().collect()
      .map(_.get(0))
    val index = spark.read.parquet(dir)
      .filter(col("cluster").isin(probed.toSeq: _*))
    ivfProbe(index, idCol, vecCol, expanded, qidCol, k)
  }

  /** Persist an IVF × residual-PQ serving index — the `q_ivf_pq` layout,
    * generalized to caller tables: [[ivfAssign]] against the given
    * centroids, residual-quantize (1e-6-unit integers, subtraction AFTER
    * quantization so every downstream distance is exact integer
    * arithmetic), PQ-encode into `m` per-subspace codes (codebook = the
    * `k` lowest-id rows' residual slices by default; pass
    * `codebook = Some([[trainPqCodebook]](…))` for the per-subspace
    * k-means-trained table), and write
    * `cluster=<id>` parquet partitions with the codebook
    * (`_graft_pq_codebook`) and centroid table (`_graft_centroids`)
    * beside them. The stored row is (idCol, carried columns, vecCol,
    * norm, code0..m−1) — the float vector rides along ONLY for the
    * re-rank tail; the ADC scan payload is the m bytes.
    * The encode fold is shared verbatim with the driver fixture
    * ([[graft.operators.PersistedVectorIndex.pqEncode]]). */
  def writePqIndex(vectors: DataFrame, idCol: String, vecCol: String,
                   centroids: DataFrame, cidCol: String, cvecCol: String,
                   dir: String, m: Int = 4, k: Int = 16,
                   codebook: Option[DataFrame] = None): Unit = {
    graft.functions.DotF32.ensureRegistered(vectors.sparkSession)
    val dims = vectors.select(size(col(vecCol)).as("_n")).limit(1).collect()
    require(dims.nonEmpty, "writePqIndex: vector table is empty")
    val dim = dims.head.getInt(0)
    require(m > 0 && dim % m == 0,
      s"writePqIndex: dim $dim must divide into m=$m subspaces")
    val assigned = ivfAssign(vectors, idCol, vecCol, centroids, cidCol, cvecCol)
      .withColumn("norm", expr(s"sqrt(dot_f32($vecCol, $vecCol))"))
    val centsInt = centroids.selectExpr(s"$cidCol AS ccid",
      s"transform($cvecCol, x -> cast(round(cast(x AS double) * 1000000.0) AS bigint)) AS cq")
    val withRes = graft.operators.PersistedVectorIndex
      .withResiduals(assigned, vecCol, centsInt)
    val (cbkRows, encoded) = codebook match {
      case Some(cb) => (cb, graft.operators.PersistedVectorIndex
        .encodeWithCodebook(withRes, cb, m, dim / m))
      case None => graft.operators.PersistedVectorIndex
        .pqEncode(withRes, idCol, m, dim / m, k)
    }
    encoded.drop("vq", "r", "cq")
      .write.mode("overwrite").partitionBy("cluster").parquet(dir)
    cbkRows.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/_graft_pq_codebook")
    centroids.select(col(cidCol).as("cid"), col(cvecCol).as("cv"))
      .write.mode("overwrite").parquet(s"$dir/_graft_centroids")
  }

  /** TAKEDOWN for a [[writePqIndex]]-layout serving index: write the
    * `dir` layout minus the `deleted` ids into `outDir` — postings
    * anti-joined on `idCol` with the `cluster=` partitioning preserved
    * (probes prune identically after the takedown), the trained
    * centroid table and residual codebook copied VERBATIM. Vocabulary
    * identity is index identity: retraining on survivors would
    * re-bucket and re-code every stored posting and zero recall.
    * Exact — a posting's (cluster, codes) depend only on its own vector
    * under fixed vocabularies, so the filtered postings equal a
    * survivor re-encode row for row. At serving scale fold the rewrite
    * into the [[graft.streaming.IndexCompaction]] write-then-swap
    * instead of a sibling generation directory. */
  def retractPqIndex(spark: SparkSession, dir: String, outDir: String,
                     deleted: DataFrame, idCol: String): Unit =
    graft.operators.PersistedVectorIndex
      .retractTo(spark, dir, outDir, deleted, idCol)

  /** REBUILD a [[writePqIndex]]-layout serving index — the lifecycle's
    * retrain-and-swap verb (r18; create / probe / compact / retract
    * had no remediation once the recall audits fire). Takedowns and
    * ingestion reshape the corpus under FROZEN vocabularies (the right
    * serving-path call — see [[retractPqIndex]]), so recall drifts and
    * `q_ann_recall`-style audits alarm with no verb to answer: this is
    * that verb. It RETRAINS both vocabularies on the index's CURRENT
    * postings — the stored float vector exists precisely so the index
    * can retrain without the source table — re-encodes every posting,
    * and writes a complete sibling generation into `outDir`:
    * [[trainIvfCentroids]] (k = 0 ⇒ ⌈√N⌉ cells, `iters` Lloyd's
    * iterations from the lowest-id seeds) → [[trainPqCodebook]] over
    * the new cells' integer residuals → [[writePqIndex]] under the new
    * vocabularies. Deterministic end to end (exact integer training
    * from deterministic seeds), so a rebuild equals a from-scratch
    * train-and-write over the same vector set — spec-pinned.
    *
    * SWAP: `outDir` is a sibling generation, not an in-place rewrite —
    * serve from the old generation until the new one is complete, then
    * flip the pointer (the `q_ann_rebuild` fixture gates the flip on a
    * marker file written LAST; reference analog: re-registration
    * replacing a schema wholesale, ec:1722-1804). Report the swap with
    * a before/after recall audit over the new corpus
    * (`q_ann_rebuild_recall`'s shape). Cost: two Lloyd's trainings +
    * one linear re-encode — an offline maintenance job whose shuffle
    * shape is the original build's, nothing corpus-quadratic. */
  def rebuildPqIndex(spark: SparkSession, dir: String, outDir: String,
                     idCol: String, vecCol: String, m: Int = 4,
                     k: Int = 16, iters: Int = 2): Unit = {
    val stored = spark.read.parquet(dir)
    val codeCols = stored.columns.filter(_.matches("code\\d+"))
    val vectors = stored.drop(codeCols: _*).drop("norm", "cluster")
    // the trained centroid table feeds the codebook training AND the
    // final assignment+write — materialize once or Lloyd's re-runs
    val cents = graft.operators.Materialize(
      trainIvfCentroids(vectors, idCol, vecCol, k = 0, iters = iters))
    val cbk = trainPqCodebook(vectors, idCol, vecCol, cents, "cid", "cv",
      m, k, iters)
    writePqIndex(vectors, idCol, vecCol, cents, "cid", "cv", outDir, m, k,
      codebook = Some(cbk))
  }

  /** Train a PQ codebook with per-subspace Lloyd's iterations over the
    * INTEGER residuals — the production upgrade over [[writePqIndex]]'s
    * lowest-id seed codebook, in the [[trainIvfCentroids]] discipline:
    * deterministic seeds (the `k` lowest-id rows' residual slices),
    * exact integer arithmetic throughout (L2² assignment over micro-int
    * slices, ties on code id; element-wise integer-division means), so
    * two runs — or two engines — produce identical codewords. Empty
    * codes keep their previous codeword. Each iteration is one bounded
    * codebook broadcast + one (subspace, code, position) hash agg of
    * integer partial sums. Returns (s, c, w) rows — feed to
    * [[writePqIndex]] via `codebook = Some(...)`. */
  def trainPqCodebook(vectors: DataFrame, idCol: String, vecCol: String,
                      centroids: DataFrame, cidCol: String, cvecCol: String,
                      m: Int = 4, k: Int = 16, iters: Int = 2): DataFrame = {
    graft.functions.DotF32.ensureRegistered(vectors.sparkSession)
    val dims = vectors.select(size(col(vecCol)).as("_n")).limit(1).collect()
    require(dims.nonEmpty, "trainPqCodebook: vector table is empty")
    val dim = dims.head.getInt(0)
    require(m > 0 && dim % m == 0,
      s"trainPqCodebook: dim $dim must divide into m=$m subspaces")
    val sub = dim / m
    val assigned = ivfAssign(vectors, idCol, vecCol, centroids, cidCol, cvecCol)
    val centsInt = centroids.selectExpr(s"$cidCol AS ccid",
      s"transform($cvecCol, x -> cast(round(cast(x AS double) * 1000000.0) AS bigint)) AS cq")
    val withRes = graft.operators.PersistedVectorIndex
      .withResiduals(assigned, vecCol, centsInt)
    graft.operators.PersistedVectorIndex.trainCodebook(withRes,
      graft.operators.PersistedVectorIndex
        .codebookRows(withRes, idCol, m, sub, k),
      m, sub, iters)
  }

  /** Batched ANN probe over a [[writePqIndex]] layout — the three-stage
    * serving funnel: (1) each query is assigned its `nprobe` nearest
    * STORED centroids and the scan partition-prunes to exactly those
    * `cluster=` directories (probed ids are bounded driver metadata);
    * (2) candidates score by ADC from their m stored bytes — `q·c` (the
    * centroid term, which makes scores comparable ACROSS probed cells;
    * single-cell probes could omit it, multi-probe cannot) plus
    * Σ q_s·codeword(code_s), all exact integer micro²-units — and the
    * per-query top-`shortList` survives via a WindowGroupLimit-pruned
    * window; (3) only the short list touches its float vectors for the
    * exact 6-dp cosine re-rank, top-`topK` out as (qidCol, rank, idCol,
    * sim). Subspace geometry (m, sub) is read off the codebook — bounded
    * driver metadata, like the probed cluster ids. */
  def probePqIndex(spark: SparkSession, dir: String, idCol: String,
                   vecCol: String, queries: DataFrame, qidCol: String,
                   topK: Int = 10, shortList: Int = 32,
                   nprobe: Int = 1): DataFrame = {
    require(qidCol != idCol,
      s"qidCol and idCol are both '$idCol' — rename the query id column " +
        "so the output can carry both")
    graft.functions.DotF32.ensureRegistered(spark)
    def intVec(c: String) =
      s"transform($c, x -> cast(round(cast(x AS double) * 1000000.0) AS bigint))"
    def doti(a: String, b: String) =
      s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"
    val cbkRows = spark.read.parquet(s"$dir/_graft_pq_codebook")
    val meta = cbkRows
      .agg(max(col("s")).as("ms"), max(size(col("w"))).as("sub"))
      .collect().head
    val m = meta.getInt(0) + 1
    val sub = meta.getInt(1)
    val cbk = cbkRows.groupBy()
      .agg(sort_array(collect_list(struct(col("s"), col("c"), col("w"))))
        .as("cbk"))
    val cents = spark.read.parquet(s"$dir/_graft_centroids")
      .selectExpr("cid AS _cid", "cv AS _cv",
        "sqrt(dot_f32(cv, cv)) AS _cnorm", s"${intVec("cv")} AS _cq")
    val wp = Window.partitionBy(col(qidCol))
      .orderBy(col("_csim").desc, col("_cid"))
    val expanded = queries.select(col(qidCol), col(vecCol))
      .withColumn("_qn", expr(s"sqrt(dot_f32($vecCol, $vecCol))"))
      .withColumn("_qq", expr(intVec(vecCol)))
      .crossJoin(broadcast(cents))
      .withColumn("_csim", expr(s"dot_f32($vecCol, _cv) / (_qn * _cnorm)"))
      .withColumn("_prn", row_number().over(wp))
      .filter(col("_prn") <= nprobe)
      .select(col(qidCol), col(vecCol).as("_qv"), col("_qn"), col("_qq"),
        col("_cid").as("_qcluster"), col("_cq"))
    // bounded driver metadata (|batch| × nprobe ints), NOT data
    val probed = expanded.select(col("_qcluster")).distinct().collect()
      .map(_.get(0))
    val index = spark.read.parquet(dir)
      .filter(col("cluster").isin(probed.toSeq: _*))
    val adcExpr = (s"(${doti("_qq", "_cq")})" +: (0 until m).map { i =>
      s"(${doti(s"slice(_qq, ${i * sub} + 1, $sub)",
        s"element_at(filter(cbk, w -> w.s = $i AND w.c = code$i), 1).w")})"
    }).mkString(" + ")
    val wa = Window.partitionBy(col(qidCol))
      .orderBy(col("_adc").desc, col(idCol))
    val wr = Window.partitionBy(col(qidCol))
      .orderBy(col("_sim").desc, col(idCol))
    index.join(broadcast(expanded), col("cluster") === col("_qcluster"))
      .crossJoin(broadcast(cbk))
      .withColumn("_adc", expr(adcExpr))
      .withColumn("_arn", row_number().over(wa))
      .filter(col("_arn") <= shortList)
      .withColumn("_sim", expr(s"round(dot_f32($vecCol, _qv) / (norm * _qn), 6)"))
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= topK)
      .select(col(qidCol), col("rank"), col(idCol), col("_sim").as("sim"))
  }

  /** Perceptual near-duplicate pairs over a BINARY image column: decode
    * (netpbm P5 via the multimodal codec seam) → 64-bit row-major dHash
    * (brightness-shift invariant) → the SAME hamming-LSH band equi-join
    * as [[simhashNearDupPairs]] (4×16-bit bands, bucket join, never
    * all-pairs). Payloads that fail to parse have no fingerprint to
    * compare and are excluded HERE — audit them via
    * [[mediaFingerprints]], whose `reason` column classifies every
    * skipped payload (`q_media_quarantine` is the driver-checked form).
    * Returns (doc_a, doc_b, hamming) with hamming ≤ `maxHamming` ≤ 3
    * (the 4-band pigeonhole bound). */
  def mediaNearDupPairs(media: DataFrame, idCol: String, payloadCol: String,
                        maxHamming: Int = 2): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming must be in [0, 3]: 4 bands only guarantee a shared " +
        s"band for <= 3 differing bits (got $maxHamming)")
    val fp = mediaFingerprints(media, idCol, payloadCol)
      .filter(col("reason").isNull).select(col("doc_id"), col("dhash"))
    LlmQueries.hammingBandPairs(graft.operators.Materialize(fp), "dhash",
      bandBits = 16, maxHamming = maxHamming)
  }

  /** Image fingerprints WITH the decode verdict — one decode pass, two
    * streams: rows with `reason IS NULL` carry the 64-bit `dhash` the
    * near-dup funnel consumes; rows with a reason are the QUARANTINE (a
    * 100 TB crawl batch must report what it skipped — truncated
    * downloads, mislabeled codecs — not eat it silently). Reasons:
    * `empty`, `bad_header`, `bad_pixel_buffer`, `oversize_dims`
    * ([[graft.multimodal.MultimodalOps.dHashPgmE]]). Returns
    * (doc_id, dhash, reason). */
  def mediaFingerprints(media: DataFrame, idCol: String,
                        payloadCol: String): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        graft.multimodal.MultimodalOps.dHashPgmE(p) match {
          case Right(h) => (id, Some(h), None: Option[String])
          case Left(r) => (id, None: Option[Long], Some(r))
        }
      }).toDF("doc_id", "dhash", "reason")
  }

  /** Audio fingerprints WITH the decode verdict — the audio twin of
    * [[mediaFingerprints]]. Reasons: `empty`, `bad_container`,
    * `not_mono`, `too_short`
    * ([[graft.multimodal.MultimodalOps.audioFingerprintE]]). Returns
    * (doc_id, ahash, reason). */
  def audioFingerprints(media: DataFrame, idCol: String,
                        payloadCol: String): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        graft.multimodal.MultimodalOps.audioFingerprintE(p) match {
          case Right(h) => (id, Some(h), None: Option[String])
          case Left(r) => (id, None: Option[Long], Some(r))
        }
      }).toDF("doc_id", "ahash", "reason")
  }

  /** Deterministic epoch shuffle + sharding: each epoch induces a fresh
    * reproducible permutation of the corpus, materialized as `nShards`
    * shards with in-shard positions — the layout a training run reads.
    * Hash-sharded, so NO total-order sort over the corpus (the
    * `ORDER BY rand()` anti-pattern): one hash exchange on the shard id
    * plus a per-shard local sort. Returns (idCol, shard, pos, draw). */
  def epochShuffle(docs: DataFrame, idCol: String, epoch: Int,
                   nShards: Int): DataFrame =
    CorpusOps.epochShuffle(docs, idCol, epoch, nShards)

  /** Perceptual near-duplicate pairs over a BINARY audio column — the
    * audio twin of [[mediaNearDupPairs]]: decode (PCM16 WAV via the
    * multimodal container walk) → 64-bit frame-energy-delta fingerprint
    * (gain-invariant, Haitsma-Kalker shape) → the same hamming-LSH band
    * equi-join. Undecodable or too-short clips are excluded here;
    * audit them via [[audioFingerprints]]' `reason` column. */
  def audioNearDupPairs(media: DataFrame, idCol: String, payloadCol: String,
                        maxHamming: Int = 2): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming must be in [0, 3]: 4 bands only guarantee a shared " +
        s"band for <= 3 differing bits (got $maxHamming)")
    val fp = audioFingerprints(media, idCol, payloadCol)
      .filter(col("reason").isNull).select(col("doc_id"), col("ahash"))
    LlmQueries.hammingBandPairs(graft.operators.Materialize(fp), "ahash",
      bandBits = 16, maxHamming = maxHamming)
  }

  /** Per-document greedy-merge BPE token counts — the unit training
    * budgets are denominated in ([[graft.functions.BpeCount]]; one
    * codegen'd map-side kernel pass, no shuffle). */
  def bpeTokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.TextHash.ensureRegistered(docs.sparkSession)
    docs.selectExpr(idCol, s"bpe_count($textCol) AS n_bpe_tokens")
  }

  /** Token SEQUENCES from the same greedy-merge kernel: one row per
    * token in document order — (idCol, pos [1-based], token, token_id),
    * ids from the shared fixed vocabulary (merge rank, or
    * 1000 + codepoint for unmerged symbols). The rows a packing
    * pipeline feeds a trainer; map-side kernel + posexplode. */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.TextHash.ensureRegistered(docs.sparkSession)
    docs.select(col(idCol), posexplode(expr(s"bpe_encode($textCol)")))
      .selectExpr(idCol, "cast(pos + 1 AS int) AS pos", "col AS token",
        s"cast(${graft.functions.BpeCount.idCase("col", "ascii")} AS bigint) AS token_id")
  }

  /** LEARN a BPE merge table from the corpus (the training half of the
    * tokenizer story — [[bpeEncode]] applies such a table). One corpus
    * pass builds the word histogram; each round then counts adjacent
    * symbol pairs over the vocab-sized histogram only, picks the
    * highest-frequency pair ((count DESC, a, b) total tie order), and
    * applies the merge before the next round. Returns (merge_rank,
    * pair_a, pair_b, merged, cnt) in rank order. */
  def bpeTrain(docs: DataFrame, textCol: String,
      rounds: Int = graft.operators.CorpusOps.BpeTrainRounds): DataFrame =
    graft.operators.CorpusOps.bpeTrain(docs, textCol, rounds)

  /** Reciprocal-rank fusion of `rankings` — any number of ranked lists
    * (each carrying `idCol` and a 1-based `rankCol`), fused by the
    * classic Σ 1/(rrfK + rank) without any score calibration between
    * retrievers. Contributions are quantized to integer micro-units
    * BEFORE the sum (long addition is associative; double addition is
    * not), so the fused ordering is engine- and partitioning-exact.
    * Shape: union of the (bounded) lists → one hash agg → top-`k` via
    * TakeOrderedAndProject. Returns (`idCol`, n_lists, rrf_micro). */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
              k: Int, rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val contribs = rankings.map(_.select(col(idCol),
      expr(s"cast(round(1000000.0 / ($rrfK + $rankCol)) AS bigint)")
        .as("_contrib")))
    contribs.reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lists"), sum(col("_contrib")).as("rrf_micro"))
      .orderBy(col("rrf_micro").desc, col(idCol))
      .limit(k)
  }

  /** Per-group anomaly detection: each value z-scored against its own
    * group's mean/σ (exact integer moments — partitioning-independent),
    * top-`k` most anomalous per group. Returns (groupCol, rk, idCol,
    * valCol, z). */
  def zscoreOutliers(events: DataFrame, groupCol: String, idCol: String,
                     valCol: String, k: Int): DataFrame =
    ScaleOps.zscoreOutliers(events, groupCol, idCol, valCol, k)

  /** One-pass data profiling — the SUMMARIZE-style quality gate to run
    * before trusting a new data drop: per column, row/null/distinct
    * counts and min/max (numeric columns as doubles in min_num/max_num,
    * string columns lexicographically in min_str/max_str). ONE scan +
    * one aggregation + a stack unpivot — never per-column rescans.
    * `exact = false` (the 100 TB form) swaps the distinct counts for
    * HLL++ sketches: fixed-size mergeable state, no Expand. */
  def profile(df: DataFrame, numericCols: Seq[String],
              stringCols: Seq[String], exact: Boolean = true): DataFrame =
    graft.operators.RelationalQueries.profileCore(df,
      numericCols.map(c => (c, c, true)) ++ stringCols.map(c => (c, c, false)),
      exact)

  /** Exact heavy hitters: keys of integral `keyCol` whose count exceeds
    * N/`supportDenom`, without shuffling the full key space — per-
    * partition Misra-Gries candidates (superset-guaranteed), then an
    * exact recount of candidates only. The output is exact and
    * deterministic; the shuffle is bounded by partitions × supportDenom
    * candidate partials, not the distinct-key tail. Returns (k, cnt). */
  def heavyHitters(df: DataFrame, keyCol: String, supportDenom: Int): DataFrame =
    ScaleOps.heavyHitters(df, keyCol, supportDenom)

  /** Per-segment population-stability-index drift against the whole
    * input: `Σ_b (p_seg,b − p_all,b)·ln(p_seg,b/p_all,b)` over `nBuckets`
    * fixed histogram buckets of pre-bucketed `bucketCol` (rule of thumb:
    * < 0.1 stable, > 0.25 drifted). One real shuffle — the (segment,
    * bucket) count agg, map-side-bounded at |segments|×nBuckets partials;
    * probabilities are Laplace-smoothed exact-integer ratios and each
    * term is quantized to integer nano-nats before the associative sum,
    * so the score is partitioning-independent. Returns
    * (seg, n_events, psi). */
  def driftPsi(rows: DataFrame, segmentCol: String, bucketCol: String,
               nBuckets: Int): DataFrame =
    ScaleOps.driftPsi(rows, segmentCol, bucketCol, nBuckets)

  /** CLIP-score curation gate: keep rows of an already-paired frame
    * whose `aCol`/`bCol` embedding cosine clears `threshold` — the first
    * cut of a multimodal corpus build (misaligned captions teach the
    * model noise). Map-side only: codegen'd dot_f32 cosine (rounded to
    * 6 dp) + filter; adds `clip_score`. */
  def cosineAlignFilter(paired: DataFrame, aCol: String, bCol: String,
                        threshold: Double): DataFrame =
    LlmQueries.cosineAlignFilter(paired, aCol, bCol, threshold)

  /** Pair two modalities of one embedding table (`idCol div 2` = item,
    * `idCol % 2` = modality) out of ONE scan and ONE shuffle via
    * conditional FIRSTs — not a two-scan self-join. Items missing a
    * modality drop. Returns (item_id, iv, tv, img_label, txt_label);
    * feed to [[cosineAlignFilter]]. */
  def crossmodalPairs(vectors: DataFrame, idCol: String, vecCol: String,
                      labelCol: String): DataFrame =
    LlmQueries.crossmodalPairs(vectors, idCol, vecCol, labelCol)

  /** Exact-k reproducible sample per stratum (the distributed reservoir
    * replacement): each stratum ordered by the deterministic
    * multiplicative-hash draw, first `k` kept — no rand(), re-runnable.
    * Returns the input columns + `rk`. */
  def groupSample(docs: DataFrame, strata: Seq[String], idCol: String,
                  k: Int): DataFrame =
    CorpusOps.groupSample(docs, strata, idCol, k).drop("_draw")

  /** Deterministic train/val/test split: each row's `split` column
    * follows its id's multiplicative-hash residue — no rand(), so a doc
    * keeps its split across re-runs, engines, and incremental ingests
    * (late-arriving docs can never migrate eval into train). Map-side. */
  def dataSplit(docs: DataFrame, idCol: String, trainPct: Int = 90,
                valPct: Int = 5): DataFrame =
    CorpusOps.dataSplit(docs, idCol, trainPct, valPct)

  /** Token-level, regex-free PII scrubbing: `@`-bearing tokens →
    * `<EMAIL>`, ≥7-char all-digit tokens → `<PHONE>`; returns per-doc
    * counts + the scrubbed text in one map-side pass. Widen the rules
    * (or swap an NER model in via the multimodal batch seam) for
    * production — the counting/rewrite plumbing stays. */
  def piiScrub(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    CorpusOps.piiScrub(docs, idCol, textCol)

  /** Passage-level exact dedup: non-overlapping `window`-token chunks
    * fingerprinted, each flagged `keep` = is-the-first-copy — catches
    * repeated spans (quotes, licenses, templated sections) doc-level
    * dedup misses. Returns (doc_id, chunk_id, chunk_hash, keep). */
  def chunkDedup(docs: DataFrame, idCol: String, textCol: String,
                 window: Int = 256): DataFrame =
    CorpusOps.chunkDedup(docs, idCol, textCol, window)

  /** Bulk KNN graph over [[ivfAssign]] output: every vector's top-`k`
    * max-cosine neighbors among the vectors sharing its `cluster` — the
    * corpus-wide semantic-similarity graph (dedup graphs, retrieval eval,
    * cluster seeding). The self-join is an EQUI-join on the cluster id
    * (Σ|bucket|² work, never |corpus|²); the per-vector top-k is a window
    * WindowGroupLimit prunes. The assignment is materialized once
    * (eager materialization; reliable when a session checkpoint dir is
    * set) so the centroid argmax doesn't run per join
    * side. Σ|bucket|² is only sub-quadratic while buckets stay ≈ √N —
    * `bucketCap` fails the query loudly if any bucket exceeds it (a
    * degenerate assignment: too few centroids, collapsed k-means cell)
    * instead of silently running a quadratic join; the remedy is more
    * centroids (K ≈ √N) or splitting the cell. Returns (`idCol`, rk,
    * nbr_id, cluster, sim). */
  def knnGraph(assigned: DataFrame, idCol: String, vecCol: String,
               k: Int,
               bucketCap: Int = LlmQueries.DefaultKnnBucketCap): DataFrame = {
    graft.functions.DotF32.ensureRegistered(assigned.sparkSession)
    val prepared = assigned
      .select(col(idCol).as("vec_id"), col("cluster"),
        col(vecCol).as("embedding"))
      .withColumn("norm", expr("sqrt(dot_f32(embedding, embedding))"))
    LlmQueries.knnGraphBucketed(graft.operators.Materialize(prepared), k, bucketCap)
      .withColumnRenamed("vec_id", idCol)
  }

  /** Fuzzy (n-gram overlap) contamination report: for each (train doc,
    * eval doc) pair, the fraction of the train doc's distinct word
    * `n`-grams that appear in the eval doc, kept above `threshold` —
    * catches the near-verbatim leakage (whitespace/punctuation variants,
    * partial copies) an exact [[decontaminate]] fingerprint misses.
    * Both frames are addressed by the same `idCol`/`textCol` names; output
    * is (`idCol`, eval_id, n_common, n_grams, overlap). Inverted-index
    * equi-join on the gram hash (never doc × doc); grams present in more
    * than `evalGramMax` eval docs are dropped as boilerplate, which also
    * caps the per-gram join fan-out. Drop flagged ids with a left-anti
    * join to complete the decontamination. */
  def ngramOverlapPairs(train: DataFrame, evalSet: DataFrame,
                        idCol: String, textCol: String, n: Int = 13,
                        threshold: Double = 0.5,
                        evalGramMax: Int = 10): DataFrame =
    CorpusOps.ngramOverlap(train, evalSet, idCol, textCol, n, evalGramMax)
      .filter(col("overlap") >= threshold)

  /** Fixed-round integer-exact PageRank over a directed edge list —
    * graph centrality for data-selection weighting, cluster-seed picking,
    * or hub detection (feed it [[knnGraph]] edges for semantic
    * centrality). Ranks live in integer micro-units (base 150 000,
    * damping 85/100 as exact long multiply + truncating division), so the
    * result is identical across partitionings, runs, and engines. Each
    * round is one edge⋈rank equi-join plus one destination-keyed hash
    * aggregation; the degree-annotated edge list is materialized once
    * (reliable when a session checkpoint dir is set). Nodes without
    * out-edges leak their mass (the simplified-PageRank dangling policy).
    * Returns (`idCol`, rank_micro). */
  def pageRank(nodes: DataFrame, idCol: String, edges: DataFrame,
               srcCol: String, dstCol: String, iters: Int = 3): DataFrame =
    graft.operators.GraphOps.pageRank(nodes, idCol, edges, srcCol, dstCol, iters)
      .withColumnRenamed("id", idCol)

  /** Exact per-node triangle counts over an (implicitly undirected) edge
    * list — the clustering-coefficient numerator, via rank-oriented wedge
    * closure: each triangle materializes exactly once, and orientation by
    * (degree, id) bounds per-node wedge fan-out by ~√(2|E|) even when the
    * raw degree distribution is hub-skewed. Returns (`idCol`, n_tri);
    * nodes in no triangle are absent. */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String,
                     idCol: String = "id"): DataFrame =
    graft.operators.GraphOps.triangleCounts(edges, srcCol, dstCol)
      .withColumnRenamed("id", idCol)

  /** Streaming commit-LSN enrichment as a watermarked stream-stream join
    * (see [[graft.streaming.CdcPipeline.commitJoin]]): row images joined
    * to their transaction's COMMIT record; rolled-back transactions never
    * match (no commit record exists), so rollback filtering is structural.
    * Join state stays O(open transactions) under watermark eviction.
    *
    * `maxTxnSpanMicros` MUST cover the longest transaction's
    * first-image → commit event-time span: an image whose commit lands
    * beyond the bound never matches the inner join and its rows are
    * silently dropped. The default fits the driver fixture's < 80 µs
    * transactions; size it to your source's transaction horizon (the
    * state cost grows with the bound, never with the stream). */
  def commitJoin(spark: SparkSession, chunkDir: String, checkpointDir: String,
                 outDir: String, maxTxnSpanMicros: Long = 100L)
      : org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.CdcPipeline.commitJoin(spark, chunkDir, checkpointDir,
      outDir, maxTxnSpanMicros = maxTxnSpanMicros)

  /** Product-quantized similarity top-k: vectors compress to `m` one-byte
    * codes (dim/m-dim subspaces, `k` codewords each — codewords seeded
    * from the first `k` vectors by id), and the query with id `queryId`
    * scores every vector by asymmetric distance computation (exact query
    * subvector · assigned codeword, summed across subspaces). All
    * arithmetic is 1e-6-quantized integer sums — deterministic across
    * partitionings and engines. Returns (`idCol`, code0..code{m-1},
    * score_micro2, exact_micro2) for the `topK` highest ADC scores; the
    * exact integer dot rides along as the approximation audit. */
  def pqTopK(vectors: DataFrame, idCol: String, vecCol: String,
             queryId: Long, dim: Int, m: Int = 4, k: Int = 16,
             topK: Int = 10): DataFrame =
    LlmQueries.pqTopK(vectors, idCol, vecCol, Seq.empty, queryId, dim, m, k, topK)

  /** Staged conversion funnel: per entity, the deepest stage of `stages`
    * reached in `orderCol` order, each stage anchored at the FIRST
    * qualifying event within `window` order units of the previous
    * stage's anchor. Returns (`userCol`, stage ∈ [0, stages.length]) —
    * one row per entity; aggregate downstream for the funnel counts. One
    * hash shuffle collects (order, type) pairs per entity; the staging
    * is map-side list algebra, deterministic regardless of collect
    * order. Hot keys are safe: only stage-typed events within
    * `(stages.length − 1) × window` of the entity's first stage-0 event
    * reach the per-entity array, so a bot entity with 10⁸ events
    * materializes only its horizon slice; entities with no stage-0
    * event short-circuit to stage 0 without being collected. */
  def funnel(events: DataFrame, userCol: String, orderCol: String,
             typeCol: String, stages: Seq[String],
             window: Long): DataFrame =
    graft.operators.RelationalQueries.funnelStages(
      events, userCol, orderCol, typeCol, stages, window)

  /** Retention cohorts: users grouped by the period of their first
    * event, with the count still active k periods later and the cohort
    * size. One entity-keyed exchange derives the anchor AND the active
    * periods together (no first-seen self-join of the log); see
    * [[graft.operators.RelationalQueries.retentionCohorts]]. */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String,
                       period: String = "week"): DataFrame =
    graft.operators.RelationalQueries.retentionCohorts(
      events, userCol, tsCol, period)

  /** Compact a streaming index/pair-log root (the `batch=<id>` layouts
    * of [[graft.streaming.DedupStream]], [[graft.streaming.EmbDedupStream]],
    * [[graft.streaming.VectorIndexStream]]) into ONE consolidated batch
    * directory, exactly-once — probe results are identical before and
    * after, and partition-pruned probes prune the same internal
    * `sb=`/`cluster=`/`bb=` directories. An id-membership sidecar
    * (`_ids/`, [[graft.streaming.IdSidecar]]) compacts alongside its
    * index. Run between batches (single-writer). Returns the number of
    * batch directories compacted (0 = no-op), counting both stores.
    * Count-stamp note: runs bucket-stamped at different counts never
    * merge; UNSTAMPED legacy runs (pre-r16 writers) are grouped apart
    * from stamped ones here because this generic entry point cannot
    * know each scheme's frozen default — such stores converge fully
    * via their store-specific wrappers (which pass the default) or a
    * re-bucketing fold ([[rebucketIndexTiered]]), and in the meantime
    * only under-consolidate, never mis-prune. */
  def compactIndex(spark: SparkSession, root: String): Int = {
    // The band-run fold and the `_ids` sidecar fold touch disjoint
    // subtrees (the sidecar is underscore-hidden from the root's run
    // listing) — overlap them (r18, guide §2.6).
    val folded = new Array[Int](2)
    graft.streaming.BatchPar.run(
      () => folded(0) = graft.streaming.IndexCompaction.compact(spark, root),
      () => folded(1) = graft.streaming.IdSidecar.compact(spark, root))
    folded(0) + folded(1)
  }

  /** Size-tiered compaction of a streaming index root and its `_ids`
    * sidecar — the 100-TB schedule: merge at most `fanIn` similar-sized
    * runs per fold, so no maintenance call ever rewrites the whole
    * accumulated index the way [[compactIndex]]'s full fold does, and
    * each row is rewritten O(log_fanIn n) times over the index's
    * lifetime instead of once per compaction cycle (see
    * [[graft.streaming.IndexCompaction.compactTiered]] for the
    * write-amplification argument and crash discipline — identical
    * manifest swaps, one per fold). Probe results and pruning are
    * unchanged: reads union `batch=` runs and internal `bb=`/`sb=`/
    * `mb=`/`cluster=`/`ib=` schemes are preserved inside every folded
    * run. Run between batches (single-writer), as often as you like —
    * an invocation with no tier at fan-in is a cheap no-op. The default
    * `keepNewest = 1` is the checkpointed-stream replay guard: a
    * replayed micro-batch OVERWRITES its own `batch=<id>` partial, and
    * a fold that had consumed that id would see the replay re-create it
    * beside the folded copy and duplicate its rows (the replay's
    * exclude filter cannot reach rows re-homed under a negative run
    * id). Pass 0 only for a root no stream will ever replay into.
    * Label logs have their own tiered form
    * ([[graft.streaming.ClusterStream.compactStateTiered]] /
    * [[graft.streaming.EmbClusterStream.compactStateTiered]]): the
    * delta log folds tiered WITH the alias closure applied per fold
    * (r16) — each produced run is stamped with its fold high-water
    * generation, laggard runs advance one bounded rewrite at a time
    * ([[graft.streaming.ClusterStream.refreshState]]), and alias
    * partials retire once every surviving run post-dates them, so the
    * alias-clearing contraction is incremental too; the monolithic
    * [[graft.streaming.ClusterStream.compactState]] remains only as
    * the reach-steady-state-now quiesce verb. */
  def compactIndexTiered(spark: SparkSession, root: String,
      fanIn: Int = 4, keepNewest: Int = 1,
      maxRunBytes: Long = Long.MaxValue)
      : graft.streaming.IndexCompaction.TieredStats = {
    // disjoint subtrees (root's `batch=` runs vs the underscore-hidden
    // `_ids` sidecar) — overlap the two bounded folds (r18, guide §2.6)
    val stats = Array.fill(2)(graft.streaming.IndexCompaction.TieredStats(0, 0, 0, 0L))
    graft.streaming.BatchPar.run(
      () => stats(0) = graft.streaming.IndexCompaction
        .compactTiered(spark, root, fanIn, keepNewest,
          maxRunBytes = maxRunBytes),
      () => stats(1) = graft.streaming.IndexCompaction.compactTiered(spark,
        graft.streaming.IdSidecar.root(root), fanIn, keepNewest,
        maxRunBytes = maxRunBytes))
    stats(0) + stats(1)
  }

  /** Raise (or set) the bucket fan-out NEW runs of a bucket-partitioned
    * store are written at — the 100-TB knob the layout scaladocs point
    * to, now safe to turn on a LIVE store (r16): the count is per-store
    * metadata stamped into every run, probes prune each run group at
    * its own stamped count, and compaction never merges (and folds with
    * re-bucketing transforms migrate) runs across counts — so a raise
    * can never silently lose candidates against runs written at the old
    * count. Applies to the `bb=` band store (`root` = the index dir),
    * the `ib=` sidecar (`root` = `<indexDir>/_ids`), and the `lb=`
    * label delta log (`root` = `<labelsDir>/delta`). */
  def setIndexBuckets(spark: SparkSession, root: String, n: Int): Unit =
    graft.streaming.BucketMeta.setStore(spark, root, n)

  /** The coarse-partials / fine-base schedule for a text signature
    * index ([[graft.streaming.DedupStream.rebucketTiered]]): writers
    * keep a COARSE per-batch `bb=`/`ib=` fan (set the store counts low
    * via [[setIndexBuckets]] — few files committed per micro-batch),
    * and this verb refines folded runs to `toBands`/`toIds` buckets as
    * they graduate tiers, where probe pruning wants them. Probes are
    * correct at every point (count-grouped pruning); run between
    * batches like every compaction verb. */
  def rebucketIndexTiered(spark: SparkSession, indexDir: String,
      toBands: Int, toIds: Int, fanIn: Int = 4,
      maxRunBytes: Long = Long.MaxValue)
      : graft.streaming.IndexCompaction.TieredStats =
    graft.streaming.DedupStream.rebucketTiered(spark, indexDir,
      toBands, toIds, fanIn, keepNewest = 1, maxRunBytes)

  /** Knobs of [[maintain]] — one declarative statement of a streaming
    * installation's maintenance schedule, instead of each caller
    * hand-sequencing the verbs (r15 verdict #5):
    *  - `fanIn` / `maxRunBytes`: the size-tiered fold shape — ≤ fanIn
    *    similar-sized runs per merge, runs at/above the ceiling stop
    *    merging (size the ceiling to maintenance-window / fanIn);
    *  - `aliasPartialBudget`: contraction pressure — when a label
    *    log's alias partial count (merge-event generations, NOT corpus
    *    rows) exceeds it, a [[maintain]] tick additionally spends
    *    `refreshRuns` single-run closure rewrites and retires the
    *    alias partials every run then post-dates;
    *  - `snapshotKeep`: retention for snapshot-read label roots (the
    *    ER stream's entity-sized layout);
    *  - `monolithicBelowBytes`: the label-state size below which a
    *    tick's contraction PREFERS the monolithic verb — one
    *    [[graft.streaming.ClusterStream.compactState]] barrier when
    *    alias pressure trips, instead of the tiered+refresh drip.
    *    Measured basis (LABELCURVE_SCALE.json, r17): at small states
    *    the monolithic pause is job-overhead-dominated and BELOW the
    *    incremental schedule's (0.92 s vs 1.27 s at 66 KB, 1.23 s vs
    *    2.10 s at 750 KB on the measurement box), while its per-fold
    *    rewrite — the quantity that grows 13.7× across a 16× corpus —
    *    is still trivial in absolute terms. WHICH AXIS the default
    *    optimizes (r17 verdict): TOTAL contraction cost, where the
    *    monolithic schedule stays ~5× cheaper across the whole
    *    measured range (compact_sec 3.1–4.0 vs 18.7–19.4 — the
    *    incremental drip pays 4-8× write amplification for its
    *    bounded pauses), not max pause, whose extrapolated crossover
    *    is ≈ 2.6 MB (at the measured ~0.5 s/MB monolithic slope).
    *    Between ~2.6 MB and the 4 MiB default the policy therefore
    *    accepts a worst pause slightly above the incremental
    *    schedule's (~1.2 + 0.5·MB s vs ~2.1 s) in exchange for ~5×
    *    less total work; a p99-pause-tuned deployment should set
    *    ~2 MiB instead (0 = always tiered);
    *  - `contractNow = true`: the quiesce-time schedule — monolithic
    *    [[compactIndex]] / full label contraction reaching steady
    *    state in one call (what the gated queries run after their
    *    stream terminates); leave false for the between-batches tick,
    *    where every invocation is bounded and cheap no-ops are the
    *    common case. */
  final case class MaintenancePolicy(
      fanIn: Int = 4,
      maxRunBytes: Long = Long.MaxValue,
      aliasPartialBudget: Int = 8,
      refreshRuns: Int = 1,
      snapshotKeep: Int = 2,
      monolithicBelowBytes: Long = 4L << 20,
      contractNow: Boolean = false)

  /** One [[maintain]] tick's outcome, for observability: tiered fold
    * stats per store family plus the incremental-contraction and
    * retention counters (all zero on the contractNow path, which
    * reports through its verbs' own returns). */
  final case class MaintenanceStats(
      indexFolds: graft.streaming.IndexCompaction.TieredStats,
      labelFolds: graft.streaming.IndexCompaction.TieredStats,
      runsRefreshed: Int,
      aliasesRetired: Int,
      snapshotsPruned: Int,
      monolithicContractions: Int = 0)

  /** THE maintenance entry point — the policy-driven schedule over a
    * streaming installation's maintained state (r16): tiered-fold each
    * index root and its `_ids` sidecar, tiered-fold each label delta
    * log with the alias closure applied (retiring covered alias
    * partials), spend the bounded refresh budget when an alias log
    * outgrows the policy, and prune snapshot roots to the retention
    * count. Call it between micro-batches as often as you like: every
    * sub-verb is bounded (no invocation rewrites more than `fanIn`
    * similar-sized runs, one refreshed run, or — on the small-state
    * monolithic branch — a label log below `monolithicBelowBytes`)
    * and a tick with nothing to do costs a few directory listings. Single-writer per root,
    * like the verbs it drives. With `contractNow` the same entry point
    * runs the quiesce-time monolithic schedule instead. */
  def maintain(spark: SparkSession,
      indexRoots: Seq[String] = Nil,
      labelDirs: Seq[String] = Nil,
      snapshotRoots: Seq[String] = Nil,
      policy: MaintenancePolicy = MaintenancePolicy()): MaintenanceStats = {
    import graft.streaming.{BatchPar, ClusterStream, IndexCompaction}
    var idx = IndexCompaction.TieredStats(0, 0, 0, 0L)
    var lbl = IndexCompaction.TieredStats(0, 0, 0, 0L)
    var refreshed = 0
    var retired = 0
    var pruned = 0
    var mono = 0
    // A tick's per-root verbs are single-writer PER ROOT and no verb
    // reads another root's state, so DISTINCT roots contract
    // concurrently (r18, guide §2.6 — [[graft.streaming.BatchPar]]):
    // a dedup-stream tick folds its band store, sidecar, and pair log
    // as overlapping lanes instead of a driver-serial chain of bounded
    // folds. The .distinct keeps a repeated root single-writer (its
    // second fold was a sequential no-op before; concurrent manifest
    // swaps on ONE root would race).
    // Single-writer must also hold ACROSS the two lists (r19, ADVICE): a
    // root present in BOTH indexRoots and labelDirs would otherwise get
    // its index fold and its label contraction as two concurrent lanes
    // on ONE root — the manifest-swap race the per-list .distinct
    // guards against. Colliding roots fuse into one sequential lane.
    val iRoots = indexRoots.distinct
    val lRoots = labelDirs.distinct
    val collide = iRoots.toSet.intersect(lRoots.toSet)
    def fuseLanes(iLanes: Seq[() => Unit], lLanes: Seq[() => Unit])
        : Seq[() => Unit] = {
      val iByRoot = iRoots.zip(iLanes).toMap
      val lByRoot = lRoots.zip(lLanes).toMap
      iRoots.filterNot(collide).map(iByRoot) ++
        lRoots.filterNot(collide).map(lByRoot) ++
        collide.toSeq.map(r => () => { iByRoot(r)(); lByRoot(r)() })
    }
    if (policy.contractNow) {
      val lanes = fuseLanes(
        iRoots.map(r => () => { compactIndex(spark, r): Unit }),
        lRoots.map(l => () => { ClusterStream.compactState(spark, l): Unit }))
      if (lanes.nonEmpty) BatchPar.run(lanes: _*)
    } else {
      val iStats = Array.fill(iRoots.size)(IndexCompaction.TieredStats(0, 0, 0, 0L))
      // (tiered stats, refreshed, retired, monolithic) per label root
      val lStats = Array.fill(lRoots.size)(
        (IndexCompaction.TieredStats(0, 0, 0, 0L), 0, 0, 0))
      val indexLanes: Seq[() => Unit] = iRoots.zipWithIndex.map {
        case (r, i) => () => {
          iStats(i) = compactIndexTiered(spark, r, policy.fanIn,
            keepNewest = 1, policy.maxRunBytes)
        }
      }
      val labelLanes: Seq[() => Unit] = lRoots.zipWithIndex.map {
        case (l, i) => () => {
          // Contraction pressure is EITHER signal (r17 ADVICE): alias
          // partials (merge-event generations) OR committed delta run
          // count. A merge-free workload writes a delta run per batch
          // but may never trip the alias budget — without the run-count
          // term, a small state under the monolithic threshold would
          // accumulate one tiny run per batch indefinitely. The bound
          // mirrors the tiered invariant: the tiered schedule keeps run
          // count ≤ ~fanIn·log(levels), so fanIn·aliasPartialBudget runs
          // is well past "a fold is due".
          val pressure =
            ClusterStream.aliasPartials(spark, l) > policy.aliasPartialBudget ||
              ClusterStream.deltaRuns(spark, l) >
                policy.fanIn * policy.aliasPartialBudget
          // Below the measured crossover the monolithic verb is the
          // better schedule on BOTH total cost and max pause (see
          // MaintenancePolicy.monolithicBelowBytes): contract in one
          // small barrier when pressure trips, skip the tiered+refresh
          // machinery entirely. Above it, bounded folds + the refresh
          // budget keep every pause ≤ one tier's rewrite. The tick may
          // run INSIDE foreachBatch (the auto-tick), so the barrier must
          // be the REPLAY-SAFE newest−1 fold — compactState's
          // newest-inclusive closure would make a replayed batch find
          // its merges pre-applied and rewrite different partials
          // (LabelLog.compactStateSafe's scaladoc has the full argument).
          if (ClusterStream.stateBytes(spark, l) < policy.monolithicBelowBytes) {
            if (pressure) {
              ClusterStream.compactStateSafe(spark, l): Unit
              lStats(i) = (lStats(i)._1, 0, 0, 1)
            }
          } else {
            val st = ClusterStream.compactStateTiered(spark, l, policy.fanIn,
              policy.maxRunBytes)
            if (pressure) {
              val (rf, rt) = ClusterStream.refreshState(spark, l,
                policy.refreshRuns)
              lStats(i) = (st, rf, rt, 0)
            } else lStats(i) = (st, 0, 0, 0)
          }
        }
      }
      if (iRoots.nonEmpty || lRoots.nonEmpty)
        BatchPar.run(fuseLanes(indexLanes, labelLanes): _*)
      iStats.foreach(idx += _)
      lStats.foreach { case (st, rf, rt, m) =>
        lbl += st; refreshed += rf; retired += rt; mono += m
      }
    }
    snapshotRoots.foreach(r =>
      pruned += IndexCompaction.retainSnapshots(spark, r, policy.snapshotKeep))
    MaintenanceStats(idx, lbl, refreshed, retired, pruned, mono)
  }

  /** Gap-filled daily resample with last-observation-carried-forward:
    * every (entity, day) cell of the entity's active span gets a row,
    * quiet days carry the last observed daily total (integer micros)
    * forward. ONE (entity, day) aggregation touches the raw log; the
    * grid and LOCF window run on the daily grain. Requires columns
    * `user_id`, `ts`, `value` (see
    * [[graft.operators.SeriesOps.gapFillDaily]]). */
  def gapFillDaily(events: DataFrame): DataFrame =
    graft.operators.SeriesOps.gapFillDaily(events)

  /** Robust daily anomaly flags: detrended residuals gated at 3 × MAD of
    * the per-type residual series — exact-integer residuals, IEEE-exact
    * median/MAD comparison. Requires `event_type`, `ts`, `value`. */
  def anomalyDays(events: DataFrame): DataFrame =
    graft.operators.SeriesOps.anomalyDays(events)

  /** Weekday seasonality profile: per type, each ISO weekday's average
    * daily total and its micro-ratio to the overall daily average. */
  def weekdayProfile(events: DataFrame): DataFrame =
    graft.operators.SeriesOps.weekdayProfile(events)

  /** Trailing EWMA with decay 1/2 over a 30-row horizon, exact by
    * construction: power-of-two weights make the weighted sum a long
    * shift-and-add fold with a closed-form normalizer — no double
    * recursion. Requires columns `event_type`, `event_id`, `value`. */
  def ewmaTrailing(events: DataFrame): DataFrame =
    graft.operators.SeriesOps.ewmaTrailing(events)

  /** Lag-1..7 autocorrelation of the per-type daily totals: decimal-exact
    * moment sums, all lags on one window exchange, Pearson r evaluated
    * once over the exact sums. Requires `event_type`, `ts`, `value`. */
  def autocorrDaily(events: DataFrame): DataFrame =
    graft.operators.SeriesOps.autocorrDaily(events)

  /** Naive vs seasonal-naive forecast backtest over the daily series:
    * exact long error sums, integer micro MAEs + skill ratio, NULL skill
    * on a constant series. Requires `event_type`, `ts`, `value`. */
  def backtestDaily(events: DataFrame): DataFrame =
    graft.operators.SeriesOps.backtestDaily(events)

  /** RFM segmentation at the user grain: one log-collapsing aggregation,
    * then ntile(5) scores over total orders on the user table. */
  def rfmScores(events: DataFrame): DataFrame =
    graft.operators.RelationalQueries.rfmScores(events)

  /** Benford leading-digit audit: string-algebra digit extraction over
    * exact micros, one ≤9-group aggregation, micro shares vs the
    * log10(1+1/d) expectation. */
  def benfordDigits(events: DataFrame): DataFrame =
    graft.operators.RelationalQueries.benfordDigits(events)

  /** DAU/WAU/MAU engagement panel: the log collapses to distinct
    * (user, day) pairs once, each pair contributes to its trailing
    * report days via a bounded id-pair explode — no sliding distinct
    * window state. Requires `user_id`, `ts`. */
  def activeUsers(events: DataFrame): DataFrame =
    graft.operators.RelationalQueries.activeUsers(events)

  /** Key-bounded interval-overlap join: each overlapping unordered pair
    * of (key, id, start, end) DATE intervals within a key, once, with
    * the inclusive overlap length in days. Unbounded key groups should
    * bucket the time axis instead (the q_range_join scheme). */
  def intervalOverlapJoin(rows: DataFrame, keyCol: String, idCol: String,
                          startCol: String, endCol: String): DataFrame =
    graft.operators.TemporalJoins.intervalOverlapJoin(
      rows, keyCol, idCol, startCol, endCol)

  /** Multi-snapshot AS-OF-LSN read: each key's latest image at every
    * snapshot seq in `snaps` (a 1-column `snap_seq` frame, broadcast).
    * The replay form — maintained checkpoints are the frequent-reader
    * path. Requires `event_id`, `user_id`, `event_type`, `value`. */
  def asofSnapshots(events: DataFrame, snaps: DataFrame): DataFrame =
    graft.operators.CdcQueries.asofSnapshots(events, snaps)

  /** Cohort LTV curve: cumulative purchase revenue per weekly cohort by
    * week offset, normalized per cohort member in exact micros; cohorts
    * anchor on all events so non-buying members dilute LTV. */
  def cohortLtv(events: DataFrame): DataFrame =
    graft.operators.RelationalQueries.cohortLtv(events)

  /** Revenue concentration: share of total purchase revenue held by the
    * top 1/5/10/20% of users — one log-collapsing aggregation, rank and
    * cumulative windows on the user grain. */
  def revenueConcentration(events: DataFrame): DataFrame =
    graft.operators.RelationalQueries.revenueConcentration(events)

  /** Equi-width histogram of `value` in `nBins` bins: integer micro bin
    * arithmetic, 1-row bounds broadcast, one bounded aggregation. */
  def valueHistogram(events: DataFrame, nBins: Int = 20): DataFrame =
    graft.operators.RelationalQueries.valueHistogram(events, nBins)

  /** Top-k opening event-type paths (first `prefixLen` events per user):
    * WindowGroupLimit-pruned prefix, path agg on the window's own
    * partitioning, TakeOrdered top-k. Requires `user_id`, `event_id`,
    * `event_type`. */
  def pathTopk(events: DataFrame, prefixLen: Int = 3,
               k: Int = 10): DataFrame =
    graft.operators.RelationalQueries.pathTopk(events, prefixLen, k)

  /** k-anonymity risk curve over the (type, day, value-band)
    * quasi-identifier grid: classes/rows below each k in one class
    * aggregation + one single-row roll-up. */
  def kAnonymityCurve(events: DataFrame): DataFrame =
    graft.operators.RelationalQueries.kAnonymityCurve(events)

  /** Exact token-phrase search via positional postings: sound
    * `contains` scan prefilter, postings for the phrase's terms only,
    * one (doc, pos) equi-join per extra term. */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame =
    graft.operators.TextSignals.phraseSearch(docs, idCol, textCol, phrase)

  /** Stream-static dimension enrichment: the stateless streaming join —
    * apply images broadcast-joined to a bounded dim per micro-batch,
    * exactly-once through the checkpointed file sink. */
  def enrichStream(spark: SparkSession, chunkDir: String,
                   dim: DataFrame, checkpointDir: String, outDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.EnrichStream.enrich(spark, chunkDir, dim,
      checkpointDir, outDir)

  /** Pareto-frontier skyline (minimize `priceCol`, maximize `sizeCol`):
    * bucket-prefilter dominance proof broadcast onto the scan, exact
    * two-window phase on the O(frontier) survivors — never all-pairs. */
  def skyline(points: DataFrame, idCol: String, priceCol: String,
              sizeCol: String): DataFrame =
    graft.operators.SeriesOps.skyline(points, idCol, priceCol, sizeCol)

  /** Z-order (Morton) layout audit: 8-bit bucket both dimensions with
    * integer arithmetic, interleave to a 16-bit code, and report each
    * code-prefix shard's count and min/max bounds on BOTH raw axes —
    * the two-dimensional data-skipping story as a query. */
  def zorderShards(events: DataFrame): DataFrame =
    graft.operators.SeriesOps.zorderShards(events)

  /** Top-k bigram collocations by pointwise mutual information with a
    * min-support floor; micro-nat integer scores, count tables joined on
    * co-partitioned gram keys (never broadcast). */
  def pmiTop(docs: DataFrame, textCol: String, minCount: Int = 5,
             k: Int = 20): DataFrame =
    graft.operators.TextSignals.pmiTop(docs, textCol, minCount, k)

  /** Vocabulary coverage at each K in `ks`: the fraction of token
    * occurrences the top-K types capture — one count aggregation + a
    * TakeOrdered top-max(K); no global sort. */
  def vocabCoverage(docs: DataFrame, textCol: String,
                    ks: Seq[Int] = Seq(10, 100, 1000)): DataFrame =
    graft.operators.TextSignals.vocabCoverage(docs, textCol, ks)

  /** Per-document token Shannon entropy in micro-nats per token — the
    * information-theoretic degenerate-text gate; pure map-side list
    * algebra, no shuffle. */
  def tokenEntropy(docs: DataFrame, idCol: String,
                   textCol: String): DataFrame =
    graft.operators.TextSignals.tokenEntropy(docs, idCol, textCol)

  /** Incremental cluster maintenance: yesterday's labels (id, component)
    * + the batch-touching pair discoveries → today's labels, identical
    * to a full recompute (contraction closes the component-level graph,
    * bounded by the new pairs, and relabels only touched components),
    * without re-pairing the old corpus against itself. Compose with
    * `nearDupPairsIncremental` for the pair side.
    *
    * Contract: every id referenced by `newPairs` must appear in `nodes`
    * — labels are seeded from `nodes`, and an edge whose endpoint is
    * absent from the seeded label table contributes nothing (its merge
    * is dropped, not raised). Same contract as [[erIncrement]]'s
    * `entities`. */
  def clustersIncrement(nodes: DataFrame, idCol: String, labels: DataFrame,
                        newPairs: DataFrame, srcCol: String,
                        dstCol: String): DataFrame =
    DedupClusters.clustersIncrement(nodes, idCol, labels, newPairs,
      srcCol, dstCol)

  /** CONTINUOUS duplicate-cluster labels for a document stream (r14):
    * per micro-batch, [[graft.streaming.DedupStream]]-style index-probe
    * pair discovery feeds a log-structured union-find label state
    * ([[graft.streaming.LabelLog]]) — O(batch) writes per batch, never
    * a corpus-sized rewrite; after every batch the maintained state
    * equals [[dupClusters]] over everything ingested. Read labels with
    * [[graft.streaming.ClusterStream.clusterLabels]], fold the log with
    * [[graft.streaming.ClusterStream.compactState]]. */
  def clusterLabelStream(docs: DataFrame, idCol: String, textCol: String,
                         indexDir: String, pairsDir: String,
                         labelsDir: String, checkpointDir: String,
                         threshold: Double = 0.8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.ClusterStream.start(docs, idCol, textCol, indexDir,
      pairsDir, labelsDir, checkpointDir, threshold)

  /** [[clusterLabelStream]]'s embedding twin (r14): sign-sketch pair
    * discovery under planes FIXED AT INDEX CREATION —
    * [[graft.streaming.EmbClusterStream.createIndex]] first, then this;
    * maintenance refuses an uncreated index, because planes derived
    * from whichever batch arrived first would tie the pair set to
    * stream scheduling. After every batch the maintained state equals
    * [[embDupClusters]] under the index's planes. */
  def embClusterLabelStream(vectors: DataFrame, idCol: String,
                            vecCol: String, indexDir: String,
                            pairsDir: String, labelsDir: String,
                            checkpointDir: String, threshold: Double = 0.99)
      : org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.EmbClusterStream.start(vectors, idCol, vecCol,
      indexDir, pairsDir, labelsDir, checkpointDir, threshold)

  /** Streaming maintenance of the persisted ANN serving index (r14):
    * create the index with [[graft.streaming.VectorIndexStream
    * .createIndex]] (trained IVF centroids + residual-PQ codebook —
    * vocabulary identity is index identity) and every streamed batch
    * assigns/encodes against the stored tables, appending
    * `batch=<id>/cluster=<c>/` partitions that [[probeVectorIndex]] /
    * [[probePqIndex]] prune across at serve time; the maintained index
    * equals the batch build row for row. */
  def annIndexStream(vectors: DataFrame, idCol: String, vecCol: String,
                     indexDir: String, checkpointDir: String,
                     pqM: Int = 0, pqK: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.VectorIndexStream.start(vectors, idCol, vecCol,
      indexDir, checkpointDir, pqM = pqM, pqK = pqK)

  /** Asymmetric n-gram CONTAINMENT near-dup pairs:
    * `|A∩B| / min(|A|,|B|) ≥ minMicro/10⁶` over `n`-gram shingle-hash
    * sets — catches a short document embedded verbatim in a long one,
    * which union-normalized Jaccard scores near zero. Inverted-index
    * equi-join with the `df ≥ 2` unique-tail prune; grams in more than
    * `boilerplateCap` docs are dropped from the declared semantics. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       n: Int = 4, minMicro: Long = 600000L,
                       boilerplateCap: Int = 100): DataFrame =
    LlmQueries.containmentPairs(docs, idCol, textCol, n, minMicro,
      boilerplateCap)

  /** DSIR-style importance weights for domain-targeted selection: per
    * doc, the average per-bigram log-likelihood ratio (micro-nat exact)
    * between the LM of the `targetPred` subset and the whole-corpus LM.
    * Positive = target-like. Both LMs come from ONE pair of count
    * aggregations (conditional sums); resample proportionally to the
    * weight to shift a crawl toward the target domain. */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  targetPred: String): DataFrame =
    graft.operators.TextSignals.dsirWeights(docs, idCol, textCol, targetPred)

  /** Bloom-prune `probe` to rows whose `probeKey` might appear in
    * `build`'s `buildKey` — a broadcast 8 KiB bitmap tested map-side
    * BEFORE any join shuffle. No false negatives (result-transparent
    * ahead of an exact join); false positives are the bloom rate. */
  def bloomPrune(probe: DataFrame, probeKey: String,
                 build: DataFrame, buildKey: String): DataFrame =
    graft.operators.BloomJoin.bloomPrune(probe, probeKey, build, buildKey)

  /** Near-dup clusters with a QUALITY-chosen canonical representative:
    * `rep_id` = the member with max `qualityCol` (ties to smallest id)
    * — "keep the best copy", not "keep the first crawled". One extra
    * component-keyed argmax aggregation over [[dupClusters]]. */
  def clusterRepresentatives(docs: DataFrame, idCol: String,
      textCol: String, qualityCol: String,
      threshold: Double = 0.7): DataFrame =
    graft.operators.DedupClusters.clusterRepresentatives(
      docs, idCol, textCol, qualityCol, threshold)

  /** Maintain a streaming Bloom membership index over the CDC stream's
    * row-image keys: per micro-batch one 8 KiB bitmap partial + the
    * batch's distinct keys, `batch=<id>` exactly-once. */
  def maintainBloomIndex(spark: SparkSession, chunkDir: String,
      checkpointDir: String, root: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.BloomStream.maintain(spark, chunkDir, checkpointDir, root)

  /** Probe the streaming Bloom membership index: candidates fail the
    * folded bitmap map-side, survivors exact-verify against the key log
    * — returns exactly the member candidates. */
  def probeBloomIndex(spark: SparkSession, root: String,
      candidates: DataFrame, keyCol: String): DataFrame =
    graft.streaming.BloomStream.probe(spark, root, candidates, keyCol)

  /** CUSUM mean-shift changepoint per type over the daily micro series:
    * the day maximizing |n·S_k − k·S| with before/after means — pure
    * long arithmetic, argmax tie to the earliest day. Requires
    * `event_type`, `ts`, `value`. */
  def changepointDaily(events: DataFrame): DataFrame =
    graft.operators.AuditOps.changepointDaily(events)

  /** Exact two-sample Kolmogorov–Smirnov drift per type — first vs
    * second stream half by LSN order; max |F₁−F₂| held as the integer
    * numerator until one micro-division. Requires `event_type`,
    * `event_id`, `value`. */
  def ksDrift(events: DataFrame): DataFrame =
    graft.operators.AuditOps.ksDrift(events)

  /** Gini concentration per type over positive micro values —
    * decimal-exact rank·value sums, one integral division at the edge. */
  def giniByGroup(events: DataFrame): DataFrame =
    graft.operators.AuditOps.giniByGroup(events)

  /** Winsorized robust summary per type: rank-based p05/p95 clamp
    * bounds (no quantile interpolation — integer rank ceil), clamp
    * counts, and the winsorized micro mean. */
  def winsorize(events: DataFrame): DataFrame =
    graft.operators.AuditOps.winsorize(events)

  /** Inter-arrival burstiness per type: CV² of consecutive-event gaps
    * in exact microseconds (1e6 micro = Poisson). Requires
    * `event_type`, `event_id`, `ts`. */
  def burstiness(events: DataFrame): DataFrame =
    graft.operators.AuditOps.burstiness(events)

  /** Audience-overlap Jaccard for every event-type pair over distinct
    * user sets; disjoint pairs are absent. Requires `event_type`,
    * `user_id`. */
  def userOverlap(events: DataFrame): DataFrame =
    graft.operators.AuditOps.userOverlap(events)

  /** Seasonally adjusted daily series: each (type, day) total divided
    * by its weekday micro-index (the [[weekdayProfile]] arithmetic,
    * derived from one shared daily frame). */
  def seasonalAdjust(events: DataFrame): DataFrame =
    graft.operators.AuditOps.seasonalAdjust(events)

  /** Sequence-continuity audit per type: missing LSN ranges — count,
    * total missing, and the largest gap with its start. */
  def seqGaps(events: DataFrame): DataFrame =
    graft.operators.AuditOps.seqGaps(events)

  /** Heaps-law vocabulary growth: distinct-token count after each fifth
    * of the corpus in doc-id order. Requires `doc_id`, `text`. */
  def vocabGrowth(docs: DataFrame): DataFrame =
    graft.operators.AuditOps.vocabGrowth(docs)

  /** Dedup-threshold yield curve: near-dup pairs / removed / kept at
    * Jaccard 50–90% under the keep-smallest-id policy; pairs computed
    * once by the shared MinHash+LSH engine. */
  def dedupYield(docs: DataFrame): DataFrame =
    graft.operators.AuditOps.dedupYield(docs)

  /** Batch sessionization (30-min gaps-and-islands) rolled up by each
    * session's entry event type: sessions, bounce rate, events and
    * duration per session. Requires `user_id`, `event_id`,
    * `event_type`, `ts`. */
  def sessionStats(events: DataFrame): DataFrame =
    graft.operators.AuditOps.sessionStats(events)

  /** First-view → first-purchase conversion funnel timing: viewer /
    * converter counts, conversion micro-rate, and rank-ceil
    * p25/p50/p75/p90 delays (exact demo form; at scale read the same
    * report off [[approxQuantiles]]). */
  def convertDelay(events: DataFrame): DataFrame =
    graft.operators.AuditOps.convertDelay(events)

  /** Stationary distribution of the event-type Markov chain: three
    * integer-micro power-iteration rounds over the lead-pair transition
    * matrix. */
  def markovStationary(events: DataFrame): DataFrame =
    graft.operators.AuditOps.markovStationary(events)

  /** Hour-of-week activity heatmap: per type, each (ISO weekday, hour)
    * cell's count, value total, and micro-share of the type's value. */
  def hourProfile(events: DataFrame): DataFrame =
    graft.operators.AuditOps.hourProfile(events)

  /** Lorenz curve deciles per type — the curve whose area [[giniByGroup]]
    * reports as one number. */
  def lorenzDeciles(events: DataFrame): DataFrame =
    graft.operators.AuditOps.lorenzDeciles(events)

  /** Neyman variance-optimal split of a fixed sample budget across
    * strata (∝ N·σ, exact largest-remainder apportionment — allocations
    * always sum to the budget). */
  def neymanAlloc(events: DataFrame, budget: Long = 1000L): DataFrame =
    graft.operators.AuditOps.neymanAlloc(events, budget)

  /** Seasonal-naive 7-day forecast with empirical p10/p90 error bands
    * from the historical signed 7-lag errors. Requires `event_type`,
    * `ts`, `value`. */
  def forecastDaily(events: DataFrame): DataFrame =
    graft.operators.SeriesOps.forecastDaily(events)

  /** Deterministic multiplier-bootstrap CI of the value mean: 16
    * hash-weighted replicas in one scan/one aggregation; rank-based
    * interval picks over the replica means. Requires `event_id`,
    * `value`. */
  def bootstrapCi(events: DataFrame): DataFrame =
    graft.operators.AuditOps.bootstrapCi(events)

  /** Start the online sequence-continuity monitor over a CDC chunk
    * stream: one long of state per type, each missing id range emitted
    * the moment the id after it arrives (append + checkpoint =
    * exactly-once). */
  def monitorSeqGaps(spark: SparkSession, chunkDir: String,
      checkpointDir: String, outDir: String) =
    graft.streaming.GapStream.monitor(spark, chunkDir, checkpointDir,
      outDir)

  /** CDC capture lifecycle entry point (reference: `InformixCdc(...)`). */
  def cdcSession(config: CdcConfig = CdcConfig()): CdcSession = CdcSession(config)
}
