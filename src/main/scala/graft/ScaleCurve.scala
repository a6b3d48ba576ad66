package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-curve measurement (VERDICT r12 "what's missing" #2): turn "the
  * plan is bucketed" from an argument into a measured scaling exponent.
  *
  * Generates ×1/×2/×4/×8 copies of the heavy family's input tables from
  * the sf0.1 base, runs each heavy query at each scale in a FRESH
  * SparkContext (the Bench r12 isolation discipline — shared-JVM state
  * swings ±2×, which would drown the curve), and fits the log-log slope:
  * `exponent ≈ 1` is the linear/bucketed claim, `≈ 2` is a hidden
  * all-pairs term. Two slopes are reported per query: the least-squares
  * fit over all scales and the tail slope between the two largest scales
  * (fixed per-query overhead — session setup, tiny stages — biases the
  * full fit DOWN, so the tail slope is the honest upper estimate).
  *
  * The copies must grow the corpus WITHOUT changing its similarity
  * structure — naive duplication makes every document a near-dup of its
  * k−1 copies, which inflates the duplicate graph quadratically and
  * corrupts the exponent (the curve would indict the DATA, not the
  * plan). Each copy j is therefore transformed so that within-copy
  * structure is preserved exactly and cross-copy similarity is
  * destroyed:
  *  - documents / part names: letters rotated by j (a per-copy Caesar
  *    `translate`) — lengths, token boundaries, and within-copy edit/
  *    Jaccard relations are invariant; cross-copy shingle sets are
  *    disjoint on letters. Ids shift by a stride divisible by 40 / 8 so
  *    the driver bindings' `% 4`/`% 8` fixture structure is preserved.
  *  - embeddings: dimensions rotated by j — norms and within-copy
  *    cosines are invariant; cross-copy cosines decorrelate. Ids
  *    INTERLEAVE (`id·k + j`) so the IVF's first-⌈√N⌉ centroid seeds
  *    span all copies, as they would if the corpus had genuinely grown.
  *
  * r14 adds MAINTAINER legs (VERDICT r13 #3/#7) — the measured forms of
  * the streaming/serving flatness claims: per-batch ingest cost under
  * ×k history for the BM25 and ER streams, and BM25 serve cost over a
  * ×k indexed corpus (per-copy rotated terms, which closes the r13
  * "literal terms match only copy 0" exclusion).
  *
  * Usage: `runMain graft.ScaleCurve [scales] [outJson] [legs]`
  * (defaults `1,2,4,8`, `SCALECURVE.json`, all legs; `legs` is a
  * comma-separated name subset — e.g. the ×16 tail probe runs
  * `4,8,16 SCALECURVE_TAIL.json q_containment,q_cluster_increment`);
  * base dir from SPARK_GRAFT_SF_DIR (default sf0.1), scaled parquet
  * under java.io.tmpdir/graft_scale.
  */
object ScaleCurve {

  /** The heavy family called out by the r12 verdict, and the one table
    * each reads (only that table is regenerated per scale). */
  val Heavy: Seq[(String, String)] = Seq(
    "q_er_pipeline" -> "part",
    "q_dup_clusters" -> "documents",
    "q_near_dedup_minhash" -> "documents",
    "q_knn_join" -> "embeddings",
    "q_substring_dedup" -> "documents",
    // r13 extensions — the other corpus-derived similarity engines.
    // Excluded by design: q_bm25_topk's literal query terms match only
    // copy 0 after rotation (its serve-cost claim is measured by the
    // q_bm25_serve maintainer leg below, whose terms rotate WITH the
    // copies); q_emb_clusters' first-6-ids hyperplanes become six
    // rotations of ONE vector under id interleaving — a degenerate
    // sketch that would measure the fixture, not the plan.
    "q_ann_trained" -> "embeddings",
    "q_simhash_pairs" -> "documents",
    "q_containment" -> "documents",
    // The incremental claim measured directly: the warm rep builds the
    // per-scale ErBase state (untimed), so the timed medians are the
    // per-batch increment cost — compare against q_er_pipeline at the
    // same scale for the increment-vs-recompute factor.
    "q_er_increment" -> "part",
    // r13 maintenance legs (state built untimed in the warm rep, same
    // as q_er_increment): the text-cluster increment, and the takedown.
    // The takedown batch is the %7 slice — a fixed FRACTION, so its
    // expected slope is ~1 (the linear pair-log/label anti-joins plus a
    // re-close that follows the deletion); a slope near 2 would mean
    // the retraction re-closed the corpus instead of the affected
    // components. q_emb_cluster_retract is excluded for q_emb_clusters'
    // pinned reason (interleaved ids degenerate the first-6-ids planes);
    // q_ann_retract is excluded because its TIMED cost is the serving
    // funnel (the rewrite happens once in the fixture build), which
    // q_ann_trained already curves.
    "q_cluster_increment" -> "documents",
    "q_cluster_retract" -> "documents")

  private def rotCol(c: Column, j: Int): Column = {
    val lo = "abcdefghijklmnopqrstuvwxyz"
    val r = j % 26
    val from = lo + lo.toUpperCase
    val to = lo.drop(r) + lo.take(r) +
      (lo.drop(r) + lo.take(r)).toUpperCase
    translate(c, from, to)
  }

  /** Driver-side twin of [[rotCol]] for lowercase query terms — the
    * maintainer legs derive copy j's terms by the same rotation the
    * copies themselves use. */
  private def rotTerm(t: String, j: Int): String = {
    val r = j % 26
    t.map(c =>
      if (c >= 'a' && c <= 'z') ('a' + (c - 'a' + r) % 26).toChar else c)
  }

  private def copies(k: Int, one: Int => DataFrame): DataFrame =
    (0 until k).map(one).reduce(_ unionByName _)

  /** Write the scaled tables for factor `k` under `out` (idempotent —
    * guarded by a done-marker, the LabelBase discipline). */
  private def buildScaled(s: SparkSession, base: String, out: String,
      k: Int): Unit = {
    val done = new java.io.File(s"$out/_GRAFT_SCALED")
    if (done.exists()) return
    new java.io.File(out).mkdirs()

    val docs = s.read.parquet(s"$base/documents.parquet")
    val dStride = (docs.agg(max("doc_id")).head().getLong(0) / 40 + 1) * 40
    copies(k, j => docs.select(
        (col("doc_id") + lit(j * dStride)).as("doc_id"),
        rotCol(col("text"), j).as("text"),
        col("lang"), col("source"), col("n_chars")))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val part = s.read.parquet(s"$base/part.parquet")
    // Divisible by 40 = lcm(8, 4·5): preserves q_er_pipeline's %4 slice
    // and %8 dirty split AND q_er_increment's (div 4) % 5 batch split
    // in every copy.
    val pStride = (part.agg(max("p_partkey")).head().getLong(0) / 40 + 1) * 40
    copies(k, j => part.select(
        (col("p_partkey") + lit(j * pStride)).as("p_partkey"),
        rotCol(col("p_name"), j).as("p_name"),
        rotCol(col("p_brand"), j).as("p_brand"),
        rotCol(col("p_type"), j).as("p_type"),
        col("p_size"), col("p_retailprice")))
      .write.mode("overwrite").parquet(s"$out/part.parquet")

    val emb = s.read.parquet(s"$base/embeddings.parquet")
    copies(k, j => emb.select(
        (col("vec_id") * lit(k.toLong) + lit(j.toLong)).as("vec_id"),
        expr(s"concat(slice(embedding, ${j + 1}, size(embedding) - $j), " +
          s"slice(embedding, 1, $j))").as("embedding"),
        col("label")))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    done.createNewFile(): Unit
  }

  private def tag(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9]", "_")

  /** MAINTAINER legs (r14, VERDICT r13 #3/#7): fn(session, scaledDir, k).
    *
    *  - q_bm25_serve: serve the maintained BM25 index built over the ×k
    *    corpus with the LAST copy's rotated terms — the match set is one
    *    copy's documents (constant) while the indexed state grows ×k, so
    *    the timed cost is exactly the claim the r14 layout makes:
    *    tb-bucket-pruned postings scan + dl-in-posting + maintained
    *    1-row stats ⇒ serve flat in corpus size. The index build is the
    *    untimed warm rep (Bm25Base keyed per scaled dir).
    *  - s_bm25_batch / s_er_batch: per-batch streaming-maintenance cost
    *    under ×k HISTORY — history is pre-ingested untimed (4·k batch
    *    partials; for ER, k id-shifted replicas of the base mention set
    *    against the FIXED base catalog, so the pair log grows ×k while
    *    batch and catalog stay constant), and the timed work is ONE
    *    fixed base-sized batch. Near-zero slope is the measured form of
    *    "per-batch cost independent of history length" (ErStream's
    *    header claim; trivially expected for BM25, whose ingest reads
    *    no history at all — the leg pins that it STAYS true).
    *  - s_dedup_batch: the same ×k-history shape for the signature-index
    *    stream, whose per-batch claim is the SOFTEST of the three
    *    ("nothing is proportional to corpus size except the equi-join's
    *    bucket fan-in" — but the probe's band join still SCANS the
    *    history-sized index side): the timed batch is the base corpus's
    *    %4 slice under a RESERVED rotation (13 — history copies use
    *    0..k−1) and shifted ids, so its bucket fan-in is constant while
    *    the index side grows ×k. The slope isolates the scan term. */
  /** Compact a cached maintainer history to operational steady state
    * before timing (the s_media_batch discipline, extended to the dedup
    * and label families in r15): 4k uncompacted partials × (256 `bb` +
    * 16 `ib`) dirs each is a small-files explosion the compaction verb
    * exists to fold — without it the timed batch's pruned reads open
    * O(k·buckets) file handles and the leg measures file-open overhead,
    * not maintenance. `SPARK_GRAFT_NOCOMPACT=1` SKIPS the fold — run
    * the label/dedup legs once with it and once without to measure the
    * uncompacted-vs-compacted split as data (the marker is only written
    * on an actual fold, so a later default run compacts the same cached
    * history in place). Single-writer: runs between the history build
    * and the timed batch, never concurrently with either. */
  private def compactToSteadyState(s: SparkSession, root: String,
      idx: String, labels: Option[String] = None): Unit = {
    if (sys.env.contains("SPARK_GRAFT_NOCOMPACT")) return
    val marker = new java.io.File(s"$root/_GRAFT_COMPACTED")
    if (marker.exists()) return
    streaming.IndexCompaction.compact(s, idx, keepNewest = 1): Unit
    streaming.IdSidecar.compact(s, idx, keepNewest = 1): Unit
    labels.foreach(l => streaming.ClusterStream.compactState(s, l): Unit)
    marker.createNewFile(): Unit
  }

  /** Legs whose timed batch reserves a Caesar rotation the history
    * copies (rotations 0..k−1) must stay below — validated against the
    * scale list AT STARTUP (r14 advice: the in-leg `require` lands
    * inside the timed rep's try/catch at a ×16 tail run, so the
    * reserved-rotation collision surfaced only as a silent -1 leg in
    * the JSON instead of an upfront argument error). */
  private val ReservedRotation: Map[String, Int] =
    Map("s_dedup_batch" -> 13, "s_cluster_batch" -> 13,
      "s_dedup_tiered" -> 13, "s_cluster_tiered" -> 13)

  /** Recursive delete of a cached-history root (Hadoop FS — the repo's
    * production-path discipline): the tiered legs' crash recovery. */
  private def wipeRoot(s: SparkSession, root: String): Unit = {
    val rp = new org.apache.hadoop.fs.Path(root)
    rp.getFileSystem(s.sparkContext.hadoopConfiguration)
      .delete(rp, true): Unit
  }

  private def maintainerLegs(base: String)
      : Seq[(String, String, (SparkSession, String, Int) => DataFrame)] = Seq(
    ("q_bm25_serve", "documents", (s: SparkSession, dir: String, k: Int) => {
      val (postingsPath, _, statsPath) =
        operators.RetrievalIndex.Bm25Base.ensureAll(s, dir)
      val terms = operators.RetrievalIndex.Terms.map(rotTerm(_, k - 1))
      operators.RetrievalIndex.serve(
        operators.RetrievalIndex.readPostings(s, postingsPath, terms),
        s.read.parquet(statsPath))
    }),
    ("s_bm25_batch", "documents", (s: SparkSession, dir: String, k: Int) => {
      val root = s"${sys.props("java.io.tmpdir")}/graft_scale_bm25/${tag(dir)}"
      val (p, l, st) = (s"$root/postings", s"$root/doclens", s"$root/stats")
      val done = new java.io.File(s"$root/_GRAFT_HIST")
      if (!done.exists()) {
        new java.io.File(root).mkdirs()
        val docs = Tables.spread(s, Tables.documents(s, dir))
          .select(col("doc_id"), col("text"))
        val nb = 4 * k // ×k history batches, each base-batch-sized
        (0 until nb).foreach { b =>
          streaming.Bm25Stream.processBatch(
            docs.filter(expr(s"doc_id % $nb = $b")), b.toLong, p, l, st)
        }
        done.createNewFile(): Unit
      }
      // timed: one FIXED base-sized batch against the ×k history
      // (replayed id — the overwrite-by-batch-id discipline makes the
      // reps idempotent)
      streaming.Bm25Stream.processBatch(
        Tables.spread(s, Tables.documents(s, base))
          .filter(expr("doc_id % 4 = 0")).select(col("doc_id"), col("text")),
        1000000L, p, l, st)
      s.range(1).toDF("ok")
    }),
    ("s_dedup_batch", "documents", (s: SparkSession, dir: String, k: Int) => {
      require(k < 13, s"s_dedup_batch reserves rotation 13 for the timed " +
        s"batch; history copies must stay below it (got k=$k)")
      // _v3: the r15 index layout (bb=-partitioned bands + _ids sidecar)
      // is incompatible with r14's flat cached histories, and the
      // BbBuckets=256→64 resize changes the bucket VALUES a cached
      // history was written under — a probe against a stale cache would
      // silently prune the wrong partitions.
      val root = s"${sys.props("java.io.tmpdir")}/graft_scale_dedup_v3/${tag(dir)}"
      val (idx, prs) = (s"$root/index", s"$root/pairs")
      val done = new java.io.File(s"$root/_GRAFT_HIST")
      if (!done.exists()) {
        new java.io.File(root).mkdirs()
        val docs = Tables.spread(s, Tables.documents(s, dir))
          .select(col("doc_id"), col("text"))
        val nb = 4 * k
        (0 until nb).foreach { b =>
          streaming.DedupStream.processBatch(
            docs.filter(expr(s"doc_id % $nb = $b")), b.toLong,
            "doc_id", "text", idx, prs, threshold = 0.5): Unit
        }
        done.createNewFile(): Unit
      }
      compactToSteadyState(s, root, idx)
      // timed: fixed base-sized batch under the reserved rotation +
      // a far id shift (fresh ids, cross-history similarity destroyed —
      // its bucket fan-in stays constant while the index side grows ×k)
      streaming.DedupStream.processBatch(
        Tables.spread(s, Tables.documents(s, base))
          .filter(expr("doc_id % 4 = 0"))
          .select((col("doc_id") + lit(100000000L)).as("doc_id"),
            rotCol(col("text"), 13).as("text")),
        1000000L, "doc_id", "text", idx, prs, threshold = 0.5): Unit
      s.range(1).toDF("ok")
    }),
    ("s_dedup_tiered", "documents", (s: SparkSession, dir: String, k: Int) => {
      require(k < 13, s"s_dedup_tiered reserves rotation 13 for the timed " +
        s"batch; history copies must stay below it (got k=$k)")
      // The s_dedup_batch leg measures the probe against the MONOLITHIC
      // steady state (one folded run). This leg measures it against the
      // PRODUCTION schedule: compactIndexTiered(fanIn=4, keepNewest=1)
      // interleaved after every history batch, so the index the timed
      // probe reads holds O(fanIn·log) runs and no maintenance
      // invocation ever rewrote the accumulated store (COMPACTCURVE
      // .json carries the write-side numbers; this leg carries the
      // read-side claim — per-batch probe cost stays flat when run
      // count is bounded by the tiered schedule instead of collapsed
      // to one).
      val root = s"${sys.props("java.io.tmpdir")}/graft_scale_dedup_tiered_v1/${tag(dir)}"
      val (idx, prs) = (s"$root/index", s"$root/pairs")
      val done = new java.io.File(s"$root/_GRAFT_HIST")
      if (!done.exists()) {
        // No marker = never built OR a crashed build. A crashed TIERED
        // build cannot be resumed in place: batches already folded into
        // negative runs would be re-ingested beside their folded copies
        // (the per-batch overwrite only replaces live batch= partials),
        // so wipe and rebuild from scratch.
        wipeRoot(s, root)
        new java.io.File(root).mkdirs()
        val docs = Tables.spread(s, Tables.documents(s, dir))
          .select(col("doc_id"), col("text"))
        val nb = 4 * k
        (0 until nb).foreach { b =>
          streaming.DedupStream.processBatch(
            docs.filter(expr(s"doc_id % $nb = $b")), b.toLong,
            "doc_id", "text", idx, prs, threshold = 0.5): Unit
          api.Graft.compactIndexTiered(s, idx, fanIn = 4,
            keepNewest = 1): Unit
        }
        done.createNewFile(): Unit
      }
      // timed: the s_dedup_batch batch verbatim (reserved rotation 13 +
      // far id shift) — only the history's maintenance schedule differs
      streaming.DedupStream.processBatch(
        Tables.spread(s, Tables.documents(s, base))
          .filter(expr("doc_id % 4 = 0"))
          .select((col("doc_id") + lit(100000000L)).as("doc_id"),
            rotCol(col("text"), 13).as("text")),
        1000000L, "doc_id", "text", idx, prs, threshold = 0.5): Unit
      s.range(1).toDF("ok")
    }),
    ("s_cluster_batch", "documents", (s: SparkSession, dir: String, k: Int) => {
      require(k < 13, s"s_cluster_batch reserves rotation 13 for the timed " +
        s"batch; history copies must stay below it (got k=$k)")
      val root = s"${sys.props("java.io.tmpdir")}/graft_scale_cluster_v3/${tag(dir)}"
      val (idx, prs, lbl) = (s"$root/index", s"$root/pairs", s"$root/labels")
      val done = new java.io.File(s"$root/_GRAFT_HIST")
      if (!done.exists()) {
        new java.io.File(root).mkdirs()
        val docs = Tables.spread(s, Tables.documents(s, dir))
          .select(col("doc_id"), col("text"))
        val nb = 4 * k
        (0 until nb).foreach { b =>
          streaming.ClusterStream.processBatch(
            docs.filter(expr(s"doc_id % $nb = $b")), b.toLong,
            "doc_id", "text", idx, prs, lbl, threshold = 0.5)
        }
        done.createNewFile(): Unit
      }
      compactToSteadyState(s, root, idx, Some(lbl))
      // timed: fixed base-sized batch (reserved rotation + far id shift,
      // the s_dedup_batch discipline) against ×k history — measures the
      // FULL maintenance step: probe + bucket-pruned endpoint lookup +
      // contracted closure + O(batch) delta/alias writes. The log-
      // structured label state makes the label-advance term batch-sized;
      // the remaining slope is s_dedup_batch's probe scan term, so the
      // GAP between this leg and s_dedup_batch is the measured cost of
      // maintaining labels continuously — flat if the design holds.
      streaming.ClusterStream.processBatch(
        Tables.spread(s, Tables.documents(s, base))
          .filter(expr("doc_id % 4 = 0"))
          .select((col("doc_id") + lit(100000000L)).as("doc_id"),
            rotCol(col("text"), 13).as("text")),
        1000000L, "doc_id", "text", idx, prs, lbl, threshold = 0.5)
      s.range(1).toDF("ok")
    }),
    ("s_cluster_tiered", "documents", (s: SparkSession, dir: String, k: Int) => {
      require(k < 13, s"s_cluster_tiered reserves rotation 13 for the timed " +
        s"batch; history copies must stay below it (got k=$k)")
      // s_cluster_batch's timed step against a history maintained
      // ENTIRELY by the hybrid tiered schedule: compactIndexTiered on
      // the signature index + compactStateTiered on the label delta log
      // after every history batch, no monolithic fold ever — the
      // label-family twin of s_dedup_tiered. Measures that the FULL
      // maintenance step (probe + lb-pruned endpoint lookup +
      // contracted closure + O(batch) writes) stays flat when run
      // counts are bounded by ≤fanIn-run merges instead of collapsed,
      // and that the alias log left unclear by the tiered verb does
      // not grow the closure into the timed cost.
      val root = s"${sys.props("java.io.tmpdir")}/graft_scale_cluster_tiered_v1/${tag(dir)}"
      val (idx, prs, lbl) = (s"$root/index", s"$root/pairs", s"$root/labels")
      val done = new java.io.File(s"$root/_GRAFT_HIST")
      if (!done.exists()) {
        // Crashed tiered builds cannot resume in place (see
        // s_dedup_tiered) — and here a resumed LabelLog.advance would
        // also double every already-folded delta row, breaking the
        // one-row-per-id invariant serve() and the tiered fold's
        // soundness rest on. Wipe and rebuild.
        wipeRoot(s, root)
        new java.io.File(root).mkdirs()
        val docs = Tables.spread(s, Tables.documents(s, dir))
          .select(col("doc_id"), col("text"))
        val nb = 4 * k
        (0 until nb).foreach { b =>
          streaming.ClusterStream.processBatch(
            docs.filter(expr(s"doc_id % $nb = $b")), b.toLong,
            "doc_id", "text", idx, prs, lbl, threshold = 0.5)
          api.Graft.compactIndexTiered(s, idx, fanIn = 4,
            keepNewest = 1): Unit
          streaming.ClusterStream.compactStateTiered(s, lbl,
            fanIn = 4): Unit
        }
        done.createNewFile(): Unit
      }
      streaming.ClusterStream.processBatch(
        Tables.spread(s, Tables.documents(s, base))
          .filter(expr("doc_id % 4 = 0"))
          .select((col("doc_id") + lit(100000000L)).as("doc_id"),
            rotCol(col("text"), 13).as("text")),
        1000000L, "doc_id", "text", idx, prs, lbl, threshold = 0.5)
      s.range(1).toDF("ok")
    }),
    ("s_emb_cluster_batch", "embeddings", (s: SparkSession, dir: String, k: Int) => {
      val root = s"${sys.props("java.io.tmpdir")}/graft_scale_embcluster_v2/${tag(dir)}"
      val (idx, prs, lbl) = (s"$root/index", s"$root/pairs", s"$root/labels")
      val done = new java.io.File(s"$root/_GRAFT_HIST")
      if (!done.exists()) {
        new java.io.File(root).mkdirs()
        // Planes from the BASE corpus at every scale — the index's fixed
        // plane set must not vary with k, or the probe's bucket geometry
        // would confound the history-size term being measured.
        streaming.EmbClusterStream.createIndex(
          Tables.spread(s, Tables.embeddings(s, base)),
          "vec_id", "embedding", idx, nPlanes = 6)
        val vecs = Tables.spread(s, Tables.embeddings(s, dir))
          .select(col("vec_id"), col("embedding"))
        val nb = 4 * k
        (0 until nb).foreach { b =>
          streaming.EmbClusterStream.processBatch(
            vecs.filter(expr(s"vec_id % $nb = $b")), b.toLong,
            "vec_id", "embedding", idx, prs, lbl, threshold = 0.35)
        }
        done.createNewFile(): Unit
      }
      compactToSteadyState(s, root, idx, Some(lbl))
      // timed: fixed base-sized batch against ×k history — dim-rotation
      // 32 is reserved (copies use 0..k−1 ≤ 25 < 32 < dim 64) and ids
      // shift far out, the s_cluster_batch discipline applied to
      // vectors. Measures the FULL embedding maintenance step: sketch
      // pass + sb-pruned probe + bucket-pruned endpoint lookup +
      // contracted closure + O(batch) delta/alias writes.
      //
      // Caveat, measured and deliberate: unlike the text Caesar
      // rotation, a dim-rotation does NOT decorrelate these embeddings
      // at the 0.35 semantic threshold (cross-rotation cosine mass
      // above 0.35 ≈ the within-copy rate), so the timed batch's pair
      // count GROWS ∝k (151→1127 across ×1→×8 in the committed run).
      // That makes this leg adversarially GENEROUS: the per-batch cost
      // it reports stays flat even while pair discovery inflates ×8 —
      // at a sterile threshold the flat result would be cheaper to
      // achieve, not harder.
      streaming.EmbClusterStream.processBatch(
        Tables.spread(s, Tables.embeddings(s, base))
          .filter(expr("vec_id % 4 = 0"))
          .select((col("vec_id") + lit(100000000L)).as("vec_id"),
            expr("concat(slice(embedding, 33, size(embedding) - 32), " +
              "slice(embedding, 1, 32))").as("embedding")),
        1000000L, "vec_id", "embedding", idx, prs, lbl, threshold = 0.35)
      s.range(1).toDF("ok")
    }),
    ("s_ann_batch", "embeddings", (s: SparkSession, dir: String, k: Int) => {
      val root = s"${sys.props("java.io.tmpdir")}/graft_scale_ann/${tag(dir)}"
      val idx = s"$root/index"
      val done = new java.io.File(s"$root/_GRAFT_HIST")
      if (!done.exists()) {
        new java.io.File(root).mkdirs()
        // Vocabularies from the BASE corpus at every scale (the
        // s_emb_cluster_batch discipline): trained IVF centroids +
        // residual codebook fixed at creation.
        streaming.VectorIndexStream.createIndex(
          Tables.spread(s, Tables.embeddings(s, base))
            .select(col("vec_id"), col("embedding"), col("label")),
          "vec_id", "embedding", idx, pqM = 4)
        val vecs = Tables.spread(s, Tables.embeddings(s, dir))
          .select(col("vec_id"), col("embedding"), col("label"))
        val nb = 4 * k
        (0 until nb).foreach { b =>
          streaming.VectorIndexStream.processBatch(
            vecs.filter(expr(s"vec_id % $nb = $b")), b.toLong,
            "vec_id", "embedding", idx, pqM = 4): Unit
        }
        done.createNewFile(): Unit
      }
      // timed: fixed base-sized batch against ×k accumulated index —
      // ingest assigns/encodes against the stored vocabularies and
      // overwrites its own batch= partitions; it reads NO history, so
      // this leg measures the claim that ANN ingest is history-
      // independent BY CONSTRUCTION (reserved dim-rotation 32 + far id
      // shift keep the batch fixed while the index grows ×k).
      streaming.VectorIndexStream.processBatch(
        Tables.spread(s, Tables.embeddings(s, base))
          .filter(expr("vec_id % 4 = 0"))
          .select((col("vec_id") + lit(100000000L)).as("vec_id"),
            expr("concat(slice(embedding, 33, size(embedding) - 32), " +
              "slice(embedding, 1, 32))").as("embedding"), col("label")),
        1000000L, "vec_id", "embedding", idx, pqM = 4): Unit
      s.range(1).toDF("ok")
    }),
    ("s_media_batch", "documents", (s: SparkSession, dir: String, k: Int) => {
      // _v2: the r15 layout adds the _ids membership sidecar the r14
      // cached histories lack — the timed step must see the real state.
      val root = s"${sys.props("java.io.tmpdir")}/graft_scale_media_v2/${tag(dir)}"
      val (idx, prs, qrt) = (s"$root/index", s"$root/pairs", s"$root/quar")
      val done = new java.io.File(s"$root/_GRAFT_HIST")
      def payloads(ids: DataFrame): DataFrame = {
        import s.implicits._
        ids.select(col("doc_id")).as[Long]
          .mapPartitions(_.map(id =>
            (id, multimodal.MultimodalOps.syntheticNoisePgm(id))))
          .toDF("doc_id", "payload")
      }
      if (!done.exists()) {
        new java.io.File(root).mkdirs()
        val docs = Tables.spread(s, Tables.documents(s, dir))
        val nb = 4 * k
        (0 until nb).foreach { b =>
          streaming.MediaDedupStream.processBatch(
            payloads(docs.filter(expr(s"doc_id % $nb = $b"))), b.toLong,
            "doc_id", "payload", multimodal.MultimodalOps.dHashPgmE,
            idx, prs, qrt)
        }
        done.createNewFile(): Unit
      }
      // Compact to steady state (first measured run: 16.7 → 31.9 s at
      // ×4 uncompacted vs 6-8 s flat compacted — the r14 measurement
      // that made this the shared discipline).
      compactToSteadyState(s, root, idx)
      // timed: fixed base-sized batch against ×k index history. The
      // fingerprint is md5-noise keyed on doc_id's base group, so the
      // far id shift alone decorrelates (different bases sit ~32 bits
      // apart — no rotation needed); the batch's band fan-in is
      // constant while the index side grows ×k. Measures the FULL
      // media maintenance step: decode + fingerprint + mb-pruned band
      // probe + quarantine + index append.
      streaming.MediaDedupStream.processBatch(
        payloads(Tables.spread(s, Tables.documents(s, base))
          .filter(expr("doc_id % 4 = 0"))
          .select((col("doc_id") + lit(100000000L)).as("doc_id"))),
        1000000L, "doc_id", "payload",
        multimodal.MultimodalOps.dHashPgmE, idx, prs, qrt)
      s.range(1).toDF("ok")
    }),
    ("s_er_batch", "part", (s: SparkSession, dir: String, k: Int) => {
      val root = s"${sys.props("java.io.tmpdir")}/graft_scale_er/${tag(dir)}"
      val (catalog0, mentions) = operators.FuzzyJoin.erFixture(s, base)
      val catalog = operators.Materialize(catalog0)
      // Replica stride: divisible by 40 like the corpus copies, so each
      // replica preserves the (div 4) % 4 batch structure.
      val mStride =
        (mentions.agg(max("mention_id")).head().getLong(0) / 40 + 1) * 40
      val done = new java.io.File(s"$root/_GRAFT_HIST")
      if (!done.exists()) {
        new java.io.File(root).mkdirs()
        // ×k history: k id-shifted replicas of the base mention set, 4
        // micro-batches each, all against the FIXED base catalog — the
        // pair log and snapshot count grow ×k, the per-batch mention
        // volume and the entity-sized label snapshot do not.
        var id = 0L
        (0 until k).foreach { j =>
          (0 until 4).foreach { b =>
            streaming.ErStream.processBatch(
              mentions.filter(expr(s"(mention_id div 4) % 4 = $b"))
                .select((col("mention_id") + lit(j * mStride))
                  .as("mention_id"), col("mname")),
              id, catalog, s"$root/pairs", s"$root/labels")
            id += 1
          }
        }
        done.createNewFile(): Unit
      }
      // timed: one FIXED base-sized batch (reserved stride slot 30 —
      // replicas use j < 26) against the ×k history
      streaming.ErStream.processBatch(
        mentions.filter(expr("(mention_id div 4) % 4 = 0"))
          .select((col("mention_id") + lit(30L * mStride)).as("mention_id"),
            col("mname")),
        1000000L, catalog, s"$root/pairs", s"$root/labels")
      s.range(1).toDF("ok")
    }))

  private def fmt(v: Double): String =
    if (v.isNaN) "null" // a failed leg's slope — keep the JSON parseable
    else fmtNum(v)

  private def fmtNum(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  /** Least-squares slope of ln(t) on ln(k). */
  private def slope(pts: Seq[(Int, Double)]): Double = {
    val xs = pts.map(p => math.log(p._1.toDouble))
    val ys = pts.map(p => math.log(p._2))
    val (mx, my) = (xs.sum / xs.length, ys.sum / ys.length)
    val num = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    num / xs.map(x => (x - mx) * (x - mx)).sum
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scales = args.headOption.filter(_.nonEmpty)
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(1, 2, 4, 8))
    // The copy transforms are injective only up to their alphabet: at
    // k > 26 the Caesar rotation wraps (copy j ≡ copy j−26, letter-
    // identical — the cross-copy near-dup inflation the rotation exists
    // to prevent), and an embedding rotation needs j < dim. Fail loudly
    // instead of silently corrupting the exponent.
    require(scales.nonEmpty && scales.forall(k => k >= 1 && k <= 26),
      s"scales must be in [1, 26] (letter-rotation alphabet), got $scales")
    val outJson = args.drop(1).headOption.getOrElse("SCALECURVE.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // v2: the part stride moved to lcm 40 for q_er_increment's batch
    // split — versioned root so stale x-dirs never mix generations.
    val root = s"${sys.props("java.io.tmpdir")}/graft_scale_v2/" +
      base.replaceAll("[^A-Za-z0-9]", "_")
    val Reps = 3

    val legs: Seq[(String, String, (SparkSession, String, Int) => DataFrame)] =
      Heavy.map { case (name, table) =>
        val fn = SparkEntry.queries(name)
        (name, table,
          (s: SparkSession, dir: String, _: Int) => fn(s, dir))
      } ++ maintainerLegs(base)
    // Optional leg subset (arg 3) — the ×16 tail probe reruns only the
    // steepest movers instead of paying the whole family at ×16.
    val selected = args.drop(2).headOption.filter(_.nonEmpty) match {
      case Some(list) =>
        val want = list.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val known = legs.map(_._1).toSet
        val unknown = want.filterNot(known)
        require(unknown.isEmpty, s"unknown legs: ${unknown.mkString(",")}; " +
          s"known: ${legs.map(_._1).mkString(",")}")
        legs.filter(l => want.contains(l._1))
      case None => legs
    }
    // Fail loudly BEFORE any timing: a selected leg whose reserved
    // rotation collides with the scale list would otherwise burn the
    // whole run and report the collision as a silent -1 leg.
    selected.foreach { case (name, _, _) =>
      ReservedRotation.get(name).foreach(r =>
        require(scales.max < r,
          s"$name reserves rotation $r for its timed batch; history " +
            s"copies must stay below it — run scales < $r or exclude " +
            s"the leg (got $scales)"))
    }

    // One generation session; timing sessions are fresh per (query, k).
    val gen = Session.build(s"local[$cpus]", cpus)
    gen.sparkContext.setLogLevel("WARN")
    val dirs = scales.map { k =>
      val out = s"$root/x$k"
      buildScaled(gen, base, out, k)
      k -> out
    }
    gen.stop()

    val results = selected.map { case (name, table, fn) =>
      val times = dirs.map { case (k, dir) =>
        val spark = Session.build(s"local[$cpus]", cpus)
        spark.sparkContext.setLogLevel("WARN")
        try fn(spark, dir, k).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () } // warm rep; timed pass reports
        // A failing (query, scale) records -1 and the run continues —
        // one OOM hours in must not discard every other engine's curve.
        val reps = (1 to Reps).flatMap { _ =>
          val t0 = System.nanoTime()
          try {
            fn(spark, dir, k).write.format("noop").mode("overwrite").save()
            Some((System.nanoTime() - t0) / 1e9)
          } catch { case e: Throwable =>
            System.err.println(s"[scale] $name x$k FAILED: ${e.getMessage}")
            None
          }
        }
        try spark.stop() catch { case _: Throwable => () }
        val med = if (reps.length == Reps) reps.sorted.apply(Reps / 2) else -1.0
        System.err.println(s"[scale] $name x$k ($table): ${fmt(med)} s")
        k -> med
      }
      // Slopes fit only the scales that succeeded; a failed leg poisons
      // neither the log-log fit nor the other queries.
      val ok = times.filter(_._2 > 0)
      val full = if (ok.length >= 2) slope(ok) else Double.NaN
      val tail = if (ok.length >= 2) slope(ok.takeRight(2)) else Double.NaN
      (name, table, times, full, tail)
    }

    val body = results.map { case (name, table, times, full, tail) =>
      val ts = times.map { case (k, t) => s""""x$k":${fmt(t)}""" }
        .mkString(",")
      s""""$name":{"table":"$table",$ts,"slope":${fmt(full)},"tail_slope":${fmt(tail)}}"""
    }.mkString(",")
    val line = s"""{"metric":"scale_curve","base":"$base","scales":[${scales.mkString(",")}],"reps":$Reps,"queries":{$body}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      (line + "\n").getBytes("UTF-8")): Unit
    println(line)
  }
}
