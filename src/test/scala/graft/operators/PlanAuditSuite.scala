package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audit as executable assertions (SURVEY §7.1a): the scale
  * properties the engine is designed around — projection/predicate
  * pushdown reaching the parquet scan, broadcast joins only on bounded
  * dims, TakeOrderedAndProject for top-k instead of a global sort — must
  * survive refactors, so they are pinned here rather than only checked by
  * eye via `graft.tools.Explain`. */
class PlanAuditSuite extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(TestSpark.spark, sf)
      .queryExecution.executedPlan.toString

  /** "Map-side" pin: the only hash exchange allowed is `Tables.spread`'s
    * input redistribution (tagged REPARTITION_BY_NUM) — any
    * ENSURE_REQUIREMENTS hash exchange is a semantic shuffle the query
    * shape is supposed to avoid. */
  private def assertNoSemanticHashExchange(p: String): Unit =
    "Exchange hashpartitioning[^\\n]*".r.findAllIn(p).foreach { e =>
      assert(e.contains("REPARTITION_BY_NUM"), s"semantic shuffle: $e")
    }

  test("q_scan_project prunes the scan to the projected columns") {
    val p = plan("q_scan_project")
    val read = "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(read.contains("event_id") && read.contains("user_id")
      && read.contains("event_type"), read)
    // value/props/ts must NOT be read — a scan of all 6 columns for a
    // 3-column projection is the anti-pattern the audit exists to catch.
    assert(!read.contains("value") && !read.contains("props")
      && !read.contains("ts"), read)
  }

  test("q_filter_seq pushes the seq predicate into the scan") {
    val p = plan("q_filter_seq")
    val pushed = "PushedFilters: [^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(pushed.contains("event_id"), s"no pushed filter on event_id: $pushed")
  }

  test("q_lookup_join broadcasts the bounded dimension") {
    assert(plan("q_lookup_join").contains("BroadcastHashJoin"))
  }

  test("q_topk_seq is TakeOrderedAndProject, not a global sort") {
    val p = plan("q_topk_seq")
    assert(p.contains("TakeOrderedAndProject"), p.linesIterator.take(5).mkString("\n"))
  }

  test("q_range_join is a bucketed equi-join, not a nested-loop theta join") {
    val p = plan("q_range_join")
    assert(!p.contains("NestedLoop"), p.linesIterator.take(8).mkString("\n"))
    // the band predicate must ride an equi-join (hash or sort-merge)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"))
  }

  test("q_near_dedup_minhash scans corpus text ONCE; final plan reuses the " +
      "materialized signatures") {
    val p = plan("q_near_dedup_minhash")
    // The shingle+minhash kernels run exactly once, in the eager signature
    // materialization (minhashMaterialized) — the query's own plan must
    // show ZERO rescans of the documents table and ZERO kernel re-runs on
    // any of its four signature references (VERDICT r6 #3: each rescan is
    // a full corpus text pass at 100 TB).
    assert(!p.contains("documents.parquet"), p.linesIterator.take(8).mkString("\n"))
    assert(!p.contains("shingle_h60p"), p)
    assert(!p.contains("minhash_sig"), p)
    assert(!p.contains("array_join"), p)
    assert(!p.contains("NestedLoop")) // banding keeps it an equi-join
    // and the kernels ARE the one-pass natives in the materialization plan
    val mat = LlmQueries.minhashMaterializedPlanForAudit(TestSpark.spark, sf)
    assert(mat.contains("shingle_h60p") && mat.contains("minhash_sig"), mat)
    assert("documents\\.parquet".r.findAllIn(mat).size <= 1, mat)
  }

  test("GLOBAL SWEEP: no batch query plans a CartesianProduct") {
    // The one unconditional scale rule: an unkeyed physical cross join of
    // two data-scaled relations is never acceptable. (1-row bounds frames
    // broadcast as BroadcastNestedLoopJoin — a different operator — and
    // stay subject to the per-query pins above.) Streaming queries are
    // excluded because building them EXECUTES the stream; their plans are
    // pinned in their own suites.
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("s_"))
      .flatMap { name =>
        val p = plan(name)
        if (p.contains("CartesianProduct")) Some(name) else None
      }
    assert(offenders.isEmpty,
      s"CartesianProduct in: ${offenders.mkString(", ")}")
  }

  test("q_gini: the rank window and the moment aggregation share ONE " +
      "type-keyed exchange") {
    val p = plan("q_gini")
    // partitionBy(event_type) for the window hash-partitions on the same
    // key the groupBy needs — a second hashpartitioning exchange would
    // mean the reuse broke (the final total-order sort is a RANGE
    // exchange and doesn't count).
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("q_ks_drift: rank window + tiny totals are the only hash " +
      "exchanges; the ECDF window and final agg reuse the partitioning") {
    val p = plan("q_ks_drift")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p)
    assert(p.contains("BroadcastHashJoin"), p) // totals ride a broadcast
  }

  test("q_session_stats: the session window and the (user, session) " +
      "aggregation share the user-keyed exchange") {
    val p = plan("q_session_stats")
    // partitionBy(user_id) co-locates every (user_id, _sid) group, so the
    // per-session aggregation must not add its own exchange; the only
    // other hash exchange allowed is the bounded entry-type roll-up.
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p)
  }

  test("q_forecast: bands and anchors broadcast onto the daily table") {
    val p = plan("q_forecast")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_seasonal_adjust broadcasts the weekday index onto the daily table") {
    val p = plan("q_seasonal_adjust")
    assert(p.contains("BroadcastHashJoin"), p)
    // the adjustment join must never shuffle the daily table for the
    // 7-rows-per-type index
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_cosine_topk scores with the native dot_f32 kernel, not " +
      "interpreted higher-order lambdas") {
    val p = plan("q_cosine_topk")
    assert(p.contains("dot_f32"))
    // aggregate(zip_with(...)) would appear as ArrayAggregate/ZipWith and
    // break whole-stage codegen around the scoring projection.
    assert(!p.contains("aggregate(") && !p.contains("zip_with"), p)
    // top-k over the scored stream, never a global sort
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q_quantized_topk scores on dot_f32, top-k via TakeOrderedAndProject") {
    val p = plan("q_quantized_topk")
    assert(p.contains("dot_f32"), p)
    assert(p.contains("TakeOrderedAndProject"), p.linesIterator.take(5).mkString("\n"))
  }

  test("q_skew_salted_join pins the shuffled-hash strategy, no broadcast") {
    // The salt only redistributes work if the join actually shuffles; a
    // broadcast of the salted dim would measure nothing (and hide a skew
    // regression). The hint must survive optimization.
    val p = plan("q_skew_salted_join")
    assert(p.contains("ShuffledHashJoin"), p.linesIterator.take(8).mkString("\n"))
    assert(!p.contains("BroadcastHashJoin"), p)
  }

  test("q_repetition_filter is map-side: no shuffle before the output sort") {
    val p = plan("q_repetition_filter")
    // one native kernel call per row — the only exchange is the final
    // ORDER BY's range partitioning; an explode+groupBy shape would add
    // a hash-partitioned exchange and shuffle every token
    assertNoSemanticHashExchange(p)
    assert(!p.contains("Generate"), p) // no explode
    // the linear-time kernel, not the quadratic filter-inside-transform
    assert(p.contains("repetition_stats"), p)
    assert(!p.contains("array_distinct"), p)
  }

  test("q_substring_dedup hashes windows once (materialized), joins dup " +
      "hashes back as a semi-join, and never shuffles text") {
    val p = plan("q_substring_dedup")
    // Both branches (window-frequency agg + position semi-join) read the
    // materialized hash arrays: the final plan re-runs neither the text
    // scan nor the hash kernel.
    assert(!p.contains("documents.parquet"), p.linesIterator.take(8).mkString("\n"))
    assert(!p.contains("h60_array"), p)
    assert(p.contains("LeftSemi"), p)
    assert(!p.toLowerCase.contains("nestedloop"), p)
  }

  test("q_fuzzy_join candidates come from an equi-join on segment keys, " +
      "never an all-pairs levenshtein") {
    val p = plan("q_fuzzy_join")
    assert(!p.toLowerCase.contains("nestedloop"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the verify predicate exists, but only above a join, not as a join
    // condition of a theta join
    assert(p.contains("levenshtein"), p)
  }

  test("q_er_increment reads persisted state and blocks only the new batch") {
    val p = plan("q_er_increment")
    assert(!p.toLowerCase.contains("nestedloop"), p)
    assert(!p.contains("CartesianProduct"), p)
    // Yesterday's links AND labels must come from the parquet state —
    // a disguised recompute (re-blocking the old corpus) would drop one
    // or both state scans from the plan.
    assert("graft_er_base".r.findAllIn(p).size >= 2,
      p.linesIterator.filter(_.contains("Scan")).mkString("\n"))
  }

  test("q_er_retract reads persisted state; the takedown never re-blocks") {
    val p = plan("q_er_retract")
    assert(!p.toLowerCase.contains("nestedloop"), p)
    assert(!p.contains("CartesianProduct"), p)
    // link log + labels must come from parquet state, and the blocking
    // chain (levenshtein verify) must be absent entirely — retraction
    // only prunes and re-closes, it never re-blocks.
    assert("graft_er_base".r.findAllIn(p).size >= 2,
      p.linesIterator.filter(_.contains("Scan")).mkString("\n"))
    assert(!p.contains("levenshtein"), "retraction re-ran the blocking chain")
  }

  test("q_cluster_retract reads persisted state; no re-pairing of the corpus") {
    val p = plan("q_cluster_retract")
    assert(!p.toLowerCase.contains("nestedloop"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert("graft_label_base".r.findAllIn(p).size >= 2,
      p.linesIterator.filter(_.contains("Scan")).mkString("\n"))
    // the MinHash kernels must not appear — pair discovery is state, not
    // recompute
    assert(!p.toLowerCase.contains("shingle"), "retraction re-ran MinHash")
  }

  test("q_emb_cluster_increment sketches under persisted planes") {
    val p = plan("q_emb_cluster_increment")
    assert(!p.toLowerCase.contains("nestedloop"), p)
    assert(!p.contains("CartesianProduct"), p)
    // The label state must come from parquet. (The planes scan feeds the
    // pair-discovery chain, which the contraction closure MATERIALIZES —
    // so it doesn't appear in the final plan; plane-fixedness is pinned
    // by the oracle instead: re-derived planes re-bucket and mismatch.)
    assert("graft_emb_label_base".r.findAllIn(p).nonEmpty,
      p.linesIterator.filter(_.contains("Scan")).mkString("\n"))
  }

  test("q_emb_cluster_retract reads persisted state; no re-sketch, no " +
      "re-verify") {
    val p = plan("q_emb_cluster_retract")
    assert(!p.toLowerCase.contains("nestedloop"), p)
    assert(!p.contains("CartesianProduct"), p)
    // pair log + labels come from the parquet state
    assert("graft_emb_label_base".r.findAllIn(p).size >= 2,
      p.linesIterator.filter(_.contains("Scan")).mkString("\n"))
    // the sketch/verify kernel must be absent — pair discovery is state,
    // never recomputed by a takedown
    assert(!p.contains("dot_f32"), "retraction re-ran the sketch/verify")
  }

  test("q_ann_batch probes buckets via broadcast equi-join, top-k via window") {
    val p = plan("q_ann_batch")
    // the probe must be a hash join on the bucket id (the batch rides a
    // broadcast), never a nested-loop over batch × table
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(8).mkString("\n"))
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q_bm25_topk filters tokens against the broadcast term set and " +
      "takes top-k without a global sort") {
    val p = plan("q_bm25_topk")
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(8).mkString("\n"))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin"), p) // every join side is bounded
  }

  test("q_tfidf_terms broadcasts the per-lang doc counts, top-k via window") {
    val p = plan("q_tfidf_terms")
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(8).mkString("\n"))
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q_simhash tallies votes in the native kernel, map-side") {
    val p = plan("q_simhash")
    assert(p.contains("simhash32"), p)
    assert(!p.contains("aggregate("), p) // no interpreted per-bit lambdas
    assertNoSemanticHashExchange(p)
  }

  test("q_sig_index build is map-side: no shuffle before the output sort") {
    val p = plan("q_sig_index")
    assert(p.contains("shingle_h60p") && p.contains("minhash_sig"), p)
    assertNoSemanticHashExchange(p)
  }

  test("q_doc_chunks is map-side: explode but no shuffle before the output sort") {
    val p = plan("q_doc_chunks")
    assertNoSemanticHashExchange(p)
    assert(p.contains("Generate"), p) // the chunk explode IS the operator
  }

  test("q_seq_pack cumulates block-locally: exactly one bounded shuffle, " +
      "never a global-order window") {
    val p = plan("q_seq_pack")
    // one hash exchange on the block key feeds the window; a global
    // prefix-sum formulation would show a single-partition Sort/Window
    // over the whole corpus instead
    val semantic = "Exchange hashpartitioning[^\\n]*".r.findAllIn(p)
      .filterNot(_.contains("REPARTITION_BY_NUM")).toList
    assert(semantic.size == 1, p.linesIterator.take(10).mkString("\n"))
    assert(semantic.head.contains("block"), semantic.head)
    assert(p.contains("Window"), p)
  }

  test("q_seq_emit cumulates block-locally like q_seq_pack: one bounded " +
      "shuffle, explode and slice map-side after the window") {
    val p = plan("q_seq_emit")
    val semantic = "Exchange hashpartitioning[^\\n]*".r.findAllIn(p)
      .filterNot(_.contains("REPARTITION_BY_NUM")).toList
    assert(semantic.size == 1, p.linesIterator.take(10).mkString("\n"))
    assert(semantic.head.contains("block"), semantic.head)
    assert(p.contains("Generate"), p) // the bin explode IS the emission
  }

  test("q_media_decode is map-side: the kernel path adds no shuffle " +
      "before the output sort") {
    val p = plan("q_media_decode")
    assertNoSemanticHashExchange(p)
    assert(p.contains("MapPartitions"), p) // the batched kernel seam
  }

  test("q_char_stats is map-side: no shuffle, no explode") {
    val p = plan("q_char_stats")
    assertNoSemanticHashExchange(p)
    assert(!p.contains("Generate"), p)
  }

  test("q_common_ngrams top-k is TakeOrderedAndProject, not a global sort") {
    val p = plan("q_common_ngrams")
    assert(p.contains("TakeOrderedAndProject"), p.linesIterator.take(5).mkString("\n"))
  }

  test("q_domain_mix total rides a broadcast; no sort-merge join") {
    val p = plan("q_domain_mix")
    assert(p.contains("Broadcast"), p.linesIterator.take(8).mkString("\n"))
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_minhash_est candidate generation stays an equi-join") {
    val p = plan("q_minhash_est")
    assert(!p.contains("NestedLoop"), p.linesIterator.take(8).mkString("\n"))
  }

  test("q_simhash_pairs bands on an equi-join, never all-pairs; " +
      "fingerprints are not recomputed in the final plan") {
    val p = plan("q_simhash_pairs")
    assert(!p.contains("NestedLoop"), p.linesIterator.take(8).mkString("\n"))
    assert(p.contains("Join"), p)
    // the simhash32 kernel ran once, in the fingerprint materialization
    assert(!p.contains("simhash32"), p)
    assert(!p.contains("documents.parquet"), p)
  }

  test("q_media_near_dup bands the dHash on an equi-join, never all-pairs; " +
      "fingerprints are not re-decoded in the final plan") {
    val p = plan("q_media_near_dup")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      p.linesIterator.take(8).mkString("\n"))
    assert(p.contains("Join"), p)
    // the decode→dHash mapPartitions ran once, into the materialized
    // fingerprint frame — the pair join must not re-scan the documents
    assert(!p.contains("documents.parquet"), p)
    assert(!p.contains("MapPartitions"), p)
  }

  test("q_audio_near_dup bands the audio fingerprint on an equi-join, " +
      "never all-pairs; fingerprints are not re-decoded in the final plan") {
    val p = plan("q_audio_near_dup")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      p.linesIterator.take(8).mkString("\n"))
    assert(p.contains("Join"), p)
    assert(!p.contains("documents.parquet"), p)
    assert(!p.contains("MapPartitions"), p)
  }

  test("q_scd2 stacks the change-compression and versioning windows on " +
      "ONE key exchange — no self-join of the history") {
    val p = plan("q_scd2")
    assert(!p.contains("Join"), p.linesIterator.take(8).mkString("\n"))
    val semantic = "Exchange hashpartitioning[^\\n]*".r.findAllIn(p).toList
    assert(semantic.size == 1, s"expected 1 key exchange, got:\n${semantic.mkString("\n")}")
  }

  test("q_heavy_hitters recounts candidates behind a broadcast semi-join " +
      "— the full key space never rides the shuffle") {
    val p = plan("q_heavy_hitters")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      p.linesIterator.take(12).mkString("\n"))
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_hard_negatives probes via broadcast bucket equi-join with the " +
      "label exclusion inside the join, top-k via pruned window") {
    val p = plan("q_hard_negatives")
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(8).mkString("\n"))
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("TakeOrderedAndProject") || p.contains("WindowGroupLimit"))
  }

  test("q_profile is ONE scan + one aggregation — no per-column rescans") {
    val p = plan("q_profile")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 scan, got $scans")
    assert(!p.contains("Union"), p.linesIterator.take(8).mkString("\n"))
  }

  test("q_bucketed_join joins and aggregates with ZERO exchanges — the " +
      "bucketed layout carries both the join and the agg") {
    val p = plan("q_bucketed_join")
    assert(p.contains("SortMergeJoin"), p.linesIterator.take(8).mkString("\n"))
    val hashEx = "Exchange hashpartitioning[^\\n]*".r.findAllIn(p).toList
    assert(hashEx.isEmpty, s"bucketed join should not shuffle:\n${hashEx.mkString("\n")}")
  }

  test("q_ann_multiprobe bucket probe is a broadcast equi-join, top-k via window") {
    // same pin as q_ann_batch: the bounded (cross-join) stages are the
    // ⌈√N⌉-row centroid broadcasts; the BUCKET probe itself must hash-join
    val p = plan("q_ann_multiprobe")
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(8).mkString("\n"))
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q_weighted_sample joins the bounded weight table via broadcast") {
    val p = plan("q_weighted_sample")
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(8).mkString("\n"))
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_curation_pipeline runs the native repetition kernel, equi-joins only") {
    val p = plan("q_curation_pipeline")
    assert(p.contains("repetition_stats"), p)
    assert(!p.contains("NestedLoop"), p)
  }

  test("q_training_pipeline composes without a nested loop and keeps the " +
      "native quality kernel; no chunk explode") {
    val p = plan("q_training_pipeline")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      p.linesIterator.take(8).mkString("\n"))
    assert(p.contains("repetition_stats"), p)
    // chunk accounting is arithmetic over n_tokens — no Generate of
    // chunk rows anywhere in the composed plan
    assert(!p.contains("Generate"), p)
  }

  test("q_decontaminate_ngram and q_dedup_increment stay equi-joins") {
    // inverted-index / LSH-banded shapes: the candidate generation must be
    // a hash or sort-merge equi-join — a nested loop would be the doc×doc
    // blowup these operators exist to avoid
    Seq("q_decontaminate_ngram", "q_dedup_increment").foreach { q =>
      val p = plan(q)
      assert(!p.contains("NestedLoop"), s"$q: ${p.linesIterator.take(8).mkString("\n")}")
    }
  }

  private def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(rmTree)); f.delete()
  }

  test("partitioned writes prune partitions at the scan") {
    // The export-side layout contract: a corpus written partitionBy(lang)
    // must answer a single-language query by reading ONLY that partition —
    // at 100 TB the difference between a directory listing and a full scan.
    val s = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("graft_part_audit").toFile
    try {
      s.read.parquet(s"$sf/documents.parquet")
        .write.mode("overwrite").partitionBy("lang").parquet(dir.getAbsolutePath)
      val p = s.read.parquet(dir.getAbsolutePath)
        .filter("lang = 'en'").selectExpr("doc_id")
        .queryExecution.executedPlan.toString
      val pf = "PartitionFilters: [^\\n]*".r.findFirstIn(p).getOrElse("")
      assert(pf.contains("lang") && pf.contains("en"), s"not pruned: $pf")
    } finally rmTree(dir)
  }

  test("bucketed tables co-locate the join: zero exchanges") {
    // The SURVEY §7.1a co-location strategy as an executable claim: two
    // tables bucketed on the join key sort-merge-join with NO shuffle on
    // either side — the shape that lets a 100 TB fact⋈fact join skip both
    // exchanges entirely. (A per-bucket Sort remains: Spark only trusts
    // sortBy order when a bucket is a single file, and it is pipelined —
    // no exchange — so the scale-relevant property is the zero-Exchange
    // plan, which is what this pins.)
    val s = TestSpark.spark
    val ev = s.read.parquet(s"$sf/events.parquet")
      .select("event_id", "user_id", "event_type", "value")
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // per-run dir + table names: concurrent runs on one machine can't
    // collide, and nothing outlives the test
    val dir = java.nio.file.Files.createTempDirectory("graft_bucket_audit").toFile
    val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val (ta, tb) = (s"bkt_a_$tag", s"bkt_b_$tag")
    try {
      Seq(ta, tb).foreach { t =>
        ev.write.bucketBy(8, "user_id").sortBy("user_id")
          .option("path", s"${dir.getAbsolutePath}/$t")
          .mode("overwrite").saveAsTable(t)
      }
      val p = s.table(ta).join(s.table(tb), "user_id")
        .queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p.linesIterator.take(6).mkString("\n"))
      assert(!p.contains("Exchange"), p)
      assert(p.contains("Bucketed: true"), p)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      Seq(ta, tb).foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
      rmTree(dir)
    }
  }

  test("q_knn_join self-joins the MATERIALIZED assignment on the bucket id; " +
      "top-k via WindowGroupLimit") {
    val p = plan("q_knn_join")
    // bucketed equi-join on the cluster id — never an all-pairs product
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      p.linesIterator.take(8).mkString("\n"))
    // the assignment is localCheckpoint'd once: the final plan must not
    // rescan the embeddings parquet or re-run the centroid argmax per side
    assert(!p.contains("embeddings.parquet"), p)
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q_pq_topk encodes and scores map-side: codebook and query ride " +
      "broadcasts, no semantic shuffle, top-k via TakeOrdered") {
    val p = plan("q_pq_topk")
    assertNoSemanticHashExchange(p)
    assert(p.contains("BroadcastExchange"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    // assignment folds over the in-row codeword array — never an explode
    // of vectors × codewords into a join
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
  }

  test("q_funnel collects only (event_id, event_type) per user — payload " +
      "columns never reach the shuffle") {
    val p = plan("q_funnel")
    val reads = "ReadSchema: [^\\n]*".r.findAllIn(p).toSeq
    // the event scans read (event_id, user_id, event_type) and nothing
    // else — payload columns must not reach any scan
    assert(reads.exists(r => r.contains("event_id") && r.contains("user_id")
      && r.contains("event_type")), reads.mkString("\n"))
    reads.foreach { r =>
      assert(!r.contains("value") && !r.contains("props")
        && !r.contains("ts:"), r)
    }
    // the stage-type filter is pushed into the scan — non-stage events
    // never leave the parquet reader
    assert(p.contains("In(event_type"), p)
    // the hot-key guard's prune (a0 horizon) and stage-0 re-attach are
    // entity-key equi-joins — never a cartesian/nested-loop — and the
    // stage logic itself stays list algebra over the collected pairs
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p)
    // the horizon prune sits BELOW the collect: the collect_list
    // aggregate's input must already be filtered against _fun_first
    val collectIdx = p.indexOf("collect_list")
    assert(collectIdx >= 0, p)
    assert(p.substring(collectIdx).contains("_fun_first"), p)
  }

  test("q_retention_cohort: one scan, no self-join of the log, payload " +
      "columns never read") {
    val p = plan("q_retention_cohort")
    val reads = "ReadSchema: [^\\n]*".r.findAllIn(p).toSeq
    // ONE events scan — the cohort anchor and the active-week set come
    // out of the same aggregation, not a first-seen self-join
    assert(reads.size == 1, reads.mkString("\n"))
    assert(reads.head.contains("user_id") && reads.head.contains("ts"),
      reads.head)
    // only (user_id, ts) leave the reader — event payloads stay columnar
    assert(!reads.head.contains("value") && !reads.head.contains("props")
      && !reads.head.contains("event_id") && !reads.head.contains("event_type"),
      reads.head)
    // no join anywhere: cohort size is a window over the aggregated grid
    assert(!p.contains("Join"), p)
    // the user-keyed aggregate combines map-side (partial collect_set +
    // min below the exchange)
    assert(p.contains("partial_collect_set") || p.contains("partial collect_set")
      || "ObjectHashAggregate[^\\n]*collect_set".r.findFirstIn(p).isDefined, p)
  }

  test("q_attribution: one user-keyed exchange, no self-join of the log") {
    val p = plan("q_attribution")
    // the carried click comes from a running window, never a purchase×click
    // self-join (which would rescan the log per purchase)
    assert(!p.contains("Join"), p)
    val reads = "ReadSchema: [^\\n]*".r.findAllIn(p).toSeq
    assert(reads.size == 1, reads.mkString("\n"))
    // payload columns beyond (id, user, type, value) stay columnar
    assert(!reads.head.contains("props") && !reads.head.contains("ts"),
      reads.head)
    // exactly one semantic hash exchange — the user-keyed window shuffle
    val sem = "Exchange hashpartitioning[^\\n]*".r.findAllIn(p).toSeq
      .filterNot(_.contains("REPARTITION_BY_NUM"))
    assert(sem.size == 1, sem.mkString("\n"))
  }

  test("q_corr: one scan, one aggregation — no per-pair rescan, no join") {
    val p = plan("q_corr")
    val reads = "ReadSchema: [^\\n]*".r.findAllIn(p).toSeq
    // all 10 moment sums fold out of ONE lineitem scan
    assert(reads.size == 1, reads.mkString("\n"))
    assert(!p.contains("Join"), p)
    // the moments aggregate map-side: a partial HashAggregate runs below
    // the single-row exchange
    assert("HashAggregate[^\\n]*partial".r.findFirstIn(p).isDefined
      || p.contains("partial_sum"), p)
    // no semantic hash exchange at all — the only exchange is the 1-row
    // partial→final single partition gather
    assertNoSemanticHashExchange(p)
  }

  test("q_graph_pagerank iterates over the MATERIALIZED edge list: no " +
      "cartesian rounds, no KNN re-derivation, top-k via TakeOrdered") {
    val p = plan("q_graph_pagerank")
    // every round is an equi-join + hash agg — never an all-pairs product
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p)
    // the degree-annotated edge list (and the assignment feeding it) are
    // materialized once: the final 3-round plan must not rescan the
    // embeddings parquet or re-run the KNN self-join per round
    assert(!p.contains("embeddings.parquet"), p)
    assert(!p.contains("dot_f32"), p)
    // final top-50 never globally sorts the rank table
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_ann_persisted probes via partition-pruned scan of the " +
      "cluster= index layout") {
    val p = plan("q_ann_persisted")
    // the probed cluster ids must reach the parquet scan as
    // PartitionFilters — the few-bucket read IS the operator's point
    val pf = "PartitionFilters: \\[[^\\]]*cluster[^\\]]*\\]".r.findFirstIn(p)
    assert(pf.isDefined, p.linesIterator.take(12).mkString("\n"))
    assert(pf.get.contains("IN ") || pf.get.contains("isin") ||
      pf.get.contains("in("), pf.get)
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q_ivf_pq: pruned bucket scan, ADC short list via " +
      "TakeOrderedAndProject, no full-corpus float scan in the probe") {
    val p = plan("q_ivf_pq")
    // stage 1: the query's cluster reaches the index scan as a
    // PartitionFilter — the probe reads ONE cluster= directory
    val pf = "PartitionFilters: \\[[^\\]]*cluster[^\\]]*\\]".r.findFirstIn(p)
    assert(pf.isDefined, p.linesIterator.take(12).mkString("\n"))
    // stage 2→3: the ADC top-32 cut is a TakeOrderedAndProject, never a
    // global sort of the bucket
    assert(p.contains("TakeOrderedAndProject"), p)
    // the probe runs on the PERSISTED index — the raw embeddings parquet
    // must not appear anywhere in the serving plan
    assert(!p.contains("embeddings.parquet"), p)
    // exact float scoring happens only in the re-rank: the top-32 cut and
    // the sim projection are collapsed into TakeOrderedAndProject, whose
    // toString elides its project list — so ANY textual dot_f32 in the
    // plan would be a pre-limit Project scoring floats against the whole
    // bucket scan, which is exactly what PQ exists to avoid
    assert(!p.contains("dot_f32"), p)
    // the ADC stage reads stored codes, not vectors: its Project (which
    // prints expressions in full) scores via the integer fold
    assert(p.contains("adc_micro2"), p)
  }

  test("q_ivf_pq_multiprobe: pruned multi-cell scan, per-query ADC " +
      "shortlist via WindowGroupLimit, no raw embedding scan") {
    val p = plan("q_ivf_pq_multiprobe")
    val pf = "PartitionFilters: \\[[^\\]]*cluster[^\\]]*\\]".r.findFirstIn(p)
    assert(pf.isDefined, p.linesIterator.take(12).mkString("\n"))
    // per-query shortlist + re-rank are windows WindowGroupLimit prunes —
    // a batch probe must never globally sort the probed set
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("embeddings.parquet"), p)
    // ADC carries the per-cell centroid term: the score expression dots
    // the query ints against the probe row's centroid ints (ccq)
    assert(p.contains("ccq"), p)
  }

  test("q_bm25_increment reads postings state PARTITION-pruned to the " +
      "query terms' tb= buckets; only the BATCH tokenizes; doclens is " +
      "never read") {
    val p = plan("q_bm25_increment")
    // both state tables come from parquet (postings + the 1-row stats)
    assert("graft_bm25_base".r.findAllIn(p).size >= 2,
      p.linesIterator.filter(_.contains("Scan")).mkString("\n"))
    // the postings scan PARTITION-prunes to the query terms' token
    // buckets (tb= PartitionFilters — the r14 bucketed layout), with the
    // exact-term In filter pushed inside the pruned buckets
    assert("PartitionFilters: \\[[^\\]]*tb#[^\\]]*\\]".r
      .findFirstIn(p).isDefined, p.linesIterator
      .filter(_.contains("PartitionFilters")).mkString("\n"))
    assert(p.contains("In(token"), p.linesIterator
      .filter(_.contains("PushedFilters")).mkString("\n"))
    // dl rides the posting and stats are maintained — the corpus-sized
    // doclens table must not appear on the increment's serve path
    assert(!p.contains("doclens_old"), p.linesIterator
      .filter(_.contains("Scan")).mkString("\n"))
    // only the BATCH tokenizes: every documents.parquet scan carries the
    // batch filter — the indexed corpus is state, never re-read as text
    // (split() repeats textually per projection reuse, so the pin is on
    // the scans, not the expression count)
    val docScans = p.linesIterator
      .filter(_.contains("documents.parquet")).toSeq
    assert(docScans.nonEmpty && docScans.forall(_.contains("% 5) = 4")),
      docScans.mkString("\n"))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_bm25_retract serves the TAKEDOWN generation — tb=-pruned scan " +
      "of the retracted layout, no anti-join, no tokenization, no " +
      "doclens (the ANN _takedown7r1 discipline on the inverted index)") {
    val p = plan("q_bm25_retract")
    assert("PartitionFilters: \\[[^\\]]*tb#[^\\]]*\\]".r
      .findFirstIn(p).isDefined, p.linesIterator
      .filter(_.contains("PartitionFilters")).mkString("\n"))
    assert(p.contains("In(token"), p.linesIterator
      .filter(_.contains("PushedFilters")).mkString("\n"))
    // every state scan reads the retracted generation — a scan of the
    // base layout would mean the takedown silently didn't apply, and an
    // anti-join at serve time would mean the rewrite never happened
    val scans = p.linesIterator.filter(_.contains("graft_bm25_base")).toSeq
    assert(scans.nonEmpty && scans.forall(_.contains("_takedown7")),
      scans.mkString("\n"))
    assert(!p.contains("LeftAnti"), "takedown re-applied at serve time")
    assert(!p.contains("split("), "takedown re-tokenized")
    assert(!p.contains("doclens"), p.linesIterator
      .filter(_.contains("Scan")).mkString("\n"))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_ann_retract serves the TAKEDOWN generation — pruned scan of " +
      "the retracted layout, never the base index or raw embeddings") {
    val p = plan("q_ann_retract")
    val pf = "PartitionFilters: \\[[^\\]]*cluster[^\\]]*\\]".r.findFirstIn(p)
    assert(pf.isDefined, p.linesIterator.take(12).mkString("\n"))
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("embeddings.parquet"), p)
    // every index scan reads the retracted generation — a scan of the
    // base layout would mean the takedown silently didn't apply
    assert(p.contains("_takedown7r1"), p)
    val scans = p.linesIterator.filter(_.contains("graft_vec_index")).toSeq
    assert(scans.nonEmpty && scans.forall(_.contains("_takedown7r1")),
      scans.mkString("\n"))
  }

  test("q_ann_recall audits the index against itself — no raw embedding " +
      "scan, windowed top-k everywhere") {
    val p = plan("q_ann_recall")
    // every arm (exact, cell, funnel×2) reads the PERSISTED index; the
    // raw embeddings parquet must not appear in the audit plan
    assert(!p.contains("embeddings.parquet"), p)
    // per-query top-k cuts are WindowGroupLimit-pruned windows, never a
    // global sort of the scored corpus
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q_epoch_shuffle moves data once — one hash exchange on the shard " +
      "id, never a corpus-wide total-order sort") {
    val p = plan("q_epoch_shuffle")
    val hashEx = "Exchange hashpartitioning[^\\n]*".r.findAllIn(p).toSeq
    assert(hashEx.length == 1, hashEx.mkString("\n"))
    assert(hashEx.head.contains("shard"), hashEx.head)
    // the only range exchange is the driver-display total order at the
    // root; the permutation itself is per-shard local sorting
    assert("Exchange rangepartitioning".r.findAllIn(p).length <= 1, p)
  }

  test("q_group_sample prunes each stratum to k via WindowGroupLimit, no join") {
    val p = plan("q_group_sample")
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("Join"), p)
  }

  test("q_zscore_outliers broadcasts the bounded moments; " +
      "top-k via WindowGroupLimit") {
    val p = plan("q_zscore_outliers")
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(8).mkString("\n"))
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q_chunk_dedup shuffles fingerprints once; the chunk explode is map-side") {
    val p = plan("q_chunk_dedup")
    // one window shuffle on the chunk hash — the shuffle carries
    // (hash, ids); chunk text never crosses the exchange
    val semantic = "Exchange hashpartitioning[^\\n]*".r.findAllIn(p)
      .filterNot(_.contains("REPARTITION_BY_NUM")).toList
    assert(semantic.size == 1, p.linesIterator.take(10).mkString("\n"))
    assert(semantic.head.contains("chunk_hash"), semantic.head)
    assert(p.contains("Generate"), p) // the chunk explode IS the operator
  }

  test("q_rrf_fusion bounds both branches with TakeOrderedAndProject " +
      "before fusing") {
    val p = plan("q_rrf_fusion")
    // each retriever's top-k must collapse to a bounded list in-plan —
    // a global sort on either branch would rank the whole corpus
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2,
      p.linesIterator.take(10).mkString("\n"))
  }

  test("sketch-only approxQuantiles is a single-pass, single-shuffle agg") {
    val ev = TestSpark.spark.read.parquet(s"$sf/events.parquet")
    val p = graft.api.Graft
      .approxQuantiles(ev, Seq("event_type"), "value", Seq(0.5, 0.99))
      .queryExecution.executedPlan.toString
    // one partial + one final aggregate over ONE exchange — the GK state
    // merges map-side; no exact-percentile value buffers anywhere
    assert("Exchange".r.findAllIn(p).size == 1, p)
    assert(p.contains("approx_percentile"), p)
    assert("(?<!approx_)percentile\\(".r.findFirstIn(p).isEmpty, p)
  }

  test("q_rank_funcs stacks all five ranking functions on ONE key " +
      "exchange — the second ordering must not add a second shuffle") {
    val p = plan("q_rank_funcs")
    assert(!p.contains("Join"), p.linesIterator.take(8).mkString("\n"))
    val semantic = "Exchange hashpartitioning[^\\n]*".r.findAllIn(p).toList
    assert(semantic.size == 1, s"expected 1 key exchange, got:\n${semantic.mkString("\n")}")
    // two Window nodes (byVal and total specs), zero extra sorts beyond
    // the per-spec sort + output sort
    assert("Window\\b".r.findAllIn(p).size >= 2, p)
  }

  test("q_lm_score joins the LM count tables on gram keys — the only " +
      "non-equi join is the 1-row vocab-size broadcast") {
    val p = plan("q_lm_score")
    assert(!p.contains("CartesianProduct"), p.linesIterator.take(8).mkString("\n"))
    // the V cross join must be a broadcast of the 1-row agg, nothing else
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
  }

  test("q_dsir joins both LM count tables on gram keys — the only " +
      "non-equi join is the 1-row vocab-size broadcast") {
    val p = plan("q_dsir")
    assert(!p.contains("CartesianProduct"), p.linesIterator.take(8).mkString("\n"))
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
  }

  test("q_containment pairs via the gram-hash equi-join, never all-pairs") {
    val p = plan("q_containment")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    // the intersection arrives as a count aggregation over the join, not
    // an array_intersect over wide shingle sets
    assert(!p.contains("array_intersect"), p)
  }

  test("q_mad_outliers broadcasts the bounded stat tables and prunes " +
      "the top-5 window") {
    val p = plan("q_mad_outliers")
    // median and MAD join back as broadcasts of |groups|-row aggregates
    // (the med join shows once in the main chain and once inside the MAD
    // aggregate's own build lineage → 3 occurrences, all broadcast)
    assert("BroadcastHashJoin".r.findAllIn(p).size == 3, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("q_tok_fertility: kernels fold map-side into one bounded hash agg") {
    val p = plan("q_tok_fertility")
    assert(!p.contains("Join"), p)
    // one semantic exchange: the language-keyed aggregation
    val sem = "Exchange hashpartitioning[^\\n]*".r.findAllIn(p).toSeq
      .filterNot(_.contains("REPARTITION_BY_NUM"))
    assert(sem.size == 1, sem.mkString("\n"))
    // partial aggregation below the exchange — the kernel counts combine
    // before they move
    assert("HashAggregate[^\\n]*partial".r.findFirstIn(p).isDefined
      || p.contains("partial_sum"), p)
  }

  test("q_lsh_recall: the only nested-loop is the declared truth-arm " +
      "cross join over the FIXED-COUNT anchor set") {
    val p = plan("q_lsh_recall")
    assert("BroadcastNestedLoopJoin|CartesianProduct".r.findAllIn(p).size <= 1,
      p)
    // the LSH arm stays the banded equi-join pipeline
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p)
    // anchor restriction of the production pair set is broadcast HASH
    // semi-joins on the K-row anchor frame, never an OR-predicate
    // nested-loop scan of every pair
    assert(p.contains("LeftSemi"), p)
  }

  test("q_sample_agg runs the custom bottom-k aggregate partial+final " +
      "with no per-group sort — the window machinery is gone") {
    val p = plan("q_sample_agg")
    assert(p.contains("ObjectHashAggregate") && p.contains("sample_k"),
      p.linesIterator.take(10).mkString("\n"))
    assert(!p.contains("WindowGroupLimit") && !p.contains("Window("), p)
    // one semantic exchange: the stratum key (spread's repartition is tagged)
    val semantic = "Exchange hashpartitioning[^\\n]*".r.findAllIn(p)
      .filterNot(_.contains("REPARTITION_BY_NUM")).toList
    assert(semantic.size == 1, semantic.mkString("\n"))
  }

  test("q_crossmodal_filter pairs modalities in ONE aggregate — no join, " +
      "one semantic exchange; scoring stays map-side dot_f32") {
    val p = plan("q_crossmodal_filter")
    // the pairing is a groupBy with conditional FIRSTs, never a two-scan
    // self-join of the embedding table
    assert(!p.contains("Join"), p.linesIterator.take(10).mkString("\n"))
    val semantic = "Exchange hashpartitioning[^\\n]*".r.findAllIn(p)
      .filterNot(_.contains("REPARTITION_BY_NUM")).toList
    assert(semantic.size == 1, semantic.mkString("\n"))
    assert(p.contains("dot_f32"), p)
  }

  test("q_drift_psi runs its grid and windows over the MATERIALIZED " +
      "segment-bucket counts — the input is never rescanned") {
    val p = plan("q_drift_psi")
    // the one real shuffle (the (seg, bucket) count agg) happened before
    // the Materialize barrier; the visible plan reads only the tiny
    // materialized count table, so the distinct-segments branch and the
    // window stack cannot rescan 100 TB of input
    assert(!p.contains("events.parquet"), p.linesIterator.take(10).mkString("\n"))
  }

  test("q_changepoint: prefix run and per-type totals both read the " +
      "MATERIALIZED daily frame — one data-scaled aggregation, no rescan") {
    val p = plan("q_changepoint")
    // the daily (type, day) aggregation — the only data-scaled shuffle —
    // happened before the Materialize barrier; its two consumers (the
    // prefix-sum run and the 1-row-per-type totals) reuse the bounded
    // daily table by construction instead of relying on Catalyst
    // exchange reuse to avoid a second scan of the event log
    assert(!p.contains("events.parquet"), p.linesIterator.take(10).mkString("\n"))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_snapshot_diff: both snapshots from ONE scan and ONE hash " +
      "exchange — no self-join of the log") {
    val p = plan("q_snapshot_diff")
    val reads = "ReadSchema: [^\\n]*".r.findAllIn(p).toSeq
    assert(reads.size == 1, reads.mkString("\n"))
    // payload columns stay columnar — only the diff's inputs leave the scan
    assert(!reads.head.contains("props") && !reads.head.contains("ts"),
      reads.head)
    assert(!p.contains("Join"), p.linesIterator.take(8).mkString("\n"))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    // the presence filter reaches the reader
    val pushed = "PushedFilters: [^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(pushed.contains("event_type"), pushed)
  }

  test("q_mv_delta: base MV + raw delta merge in ONE exchange, delta " +
      "scan pruned by the pushed seq predicate") {
    val p = plan("q_mv_delta")
    assert(!p.contains("Join"), p.linesIterator.take(8).mkString("\n"))
    // union of pre-aggregated MV rows and delta unit rows feeds ONE final
    // hash aggregate: a single semantic exchange, with map-side partials
    // folding the delta before the shuffle
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    // the delta side never rescans history — the seq filter reaches parquet
    val pushed = "PushedFilters: [^\\n]*".r.findAllIn(p).mkString("\n")
    assert(pushed.contains("GreaterThan(event_id"), pushed)
  }

  test("q_gap_fill: events collapse to the daily grain in one agg; the " +
      "grid join and LOCF window run on the daily table, never the log") {
    val p = plan("q_gap_fill")
    // exchanges: daily (user,day) agg, span (user) agg, the grid⋈daily
    // join + LOCF window reuse the user hash — nothing re-shuffles the
    // raw event log, and no global sort appears before the output one
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    val read = "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(!read.contains("props") && !read.contains("event_type"), read)
  }

  test("q_skyline: both phase tables ride broadcasts onto the " +
      "MATERIALIZED candidate set — no all-pairs join, base table " +
      "scanned at most twice") {
    val p = plan("q_skyline")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    // the exact phase joins the frontier back by broadcast; the
    // prefilter's own broadcast join ran inside the materialization
    assert("BroadcastHashJoin".r.findAllIn(p).size == 1, p)
    // the candidate set is a lineage cut: both exact-phase branches read
    // the materialized RDD — the base table is NOT re-scanned per branch
    assert(p.contains("Scan ExistingRDD") || p.contains("CheckpointRDD"), p)
    assert(!p.contains("FileScan parquet"), p)
  }

  test("q_zorder: morton code is map-side on a broadcast 1-row bounds " +
      "frame; ONE 32-group hash agg after it") {
    val p = plan("q_zorder")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p) // 1-row bounds crossJoin
    // one semantic exchange: the shard aggregation (plus the output sort)
    assert("Exchange hashpartitioning".r.findAllIn(p)
      .count(!_.contains("REPARTITION")) == 1, p)
  }

  test("q_pmi: count tables join on equi gram keys (the planner may " +
      "broadcast at toy SF — at scale they shuffle co-partitioned), " +
      "top-20 via TakeOrderedAndProject") {
    val p = plan("q_pmi")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the only non-equi join is the 1-row total broadcast
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
  }

  test("q_vocab_coverage: top-maxK is TakeOrdered-bounded — no global " +
      "sort or unbounded window over the vocabulary") {
    val p = plan("q_vocab_coverage")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_entropy is pure map-side list algebra — no semantic shuffle, " +
      "no explode") {
    val p = plan("q_entropy")
    assertNoSemanticHashExchange(p)
    assert(!p.contains("Generate"), p) // no explode: per-row fold only
  }

  test("q_bloom_join: the bitmap probe filters map-side BELOW the join " +
      "exchange; the join itself stays shuffle-merge (dim not broadcast)") {
    val p = plan("q_bloom_join")
    // the 1-row bitmap rides the only nested-loop broadcast
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size == 1, p)
    // the exact join is the hinted SMJ — a broadcast join would make the
    // bloom redundant and hide what it buys at scale
    assert(p.contains("SortMergeJoin"), p)
    // the bloom predicate exists as a Filter on the probe stream, and it
    // sits upstream (printed below) the join's exchange
    val fi = p.indexOf("element_at(bm")
    assert(fi >= 0, p)
    val smjIdx = p.indexOf("SortMergeJoin")
    assert(smjIdx >= 0 && smjIdx < fi,
      "bloom filter must be below (upstream of) the join")
  }

  test("q_cluster_rep: the representative choice is a component-keyed " +
      "argmax AGGREGATION, not a window over cluster members") {
    val p = plan("q_cluster_rep")
    // exactly one Window: clustersFromPairs' cluster_size count — the
    // rep argmax must not add a per-member sort/window
    assert("Window \\[".r.findAllIn(p).size == 1, p)
    assert(p.contains("max(struct("), p)
  }

  test("sketch-only approxDistinct is a single-pass, single-shuffle agg") {
    val ev = TestSpark.spark.read.parquet(s"$sf/events.parquet")
    val p = graft.api.Graft
      .approxDistinct(ev, Seq("event_type"), "user_id")
      .queryExecution.executedPlan.toString
    // HLL++ sketches merge map-side: one exchange, and no Expand — the
    // two-phase exact countDistinct shape this form exists to avoid
    assert("Exchange".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Expand"), p)
  }

  // --- the SQL-text frontend plans the same shapes as the DataFrame API

  test("q_sql_vector: SQL text plans the q_cosine_topk shape — kernel dot " +
      "product, broadcast 1-row query side, TakeOrderedAndProject") {
    val p = plan("q_sql_vector")
    assert(p.contains("dot_f32"), p.linesIterator.take(8).mkString("\n"))
    // the in-text /*+ BROADCAST(q) */ hint lands: 1-row side builds right
    assert(p.contains("BroadcastNestedLoopJoin"),
      p.linesIterator.take(8).mkString("\n"))
    assert(p.contains("TakeOrderedAndProject"),
      p.linesIterator.take(8).mkString("\n"))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q_sql_sample: sample_k from SQL text keeps the k-bounded map-side " +
      "partial aggregate") {
    val p = plan("q_sql_sample")
    // partial on the mappers, final after ONE exchange — the shuffle
    // carries <= |mappers|*|langs|*k pairs, never the corpus
    assert(p.contains("partial_sample_k"), p.linesIterator.take(10).mkString("\n"))
    assert("ObjectHashAggregate".r.findAllIn(p).size == 2, p)
    assert(!p.contains("Window"), p) // the aggregate form, not the window form
  }

  test("q_sql_analytics: join+window from SQL text — pruned scan, broadcast " +
      "dim join, WindowGroupLimit before the rank exchange") {
    val p = plan("q_sql_analytics")
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(12).mkString("\n"))
    // rk <= 5 over row_number pushes a group limit onto the mappers
    assert(p.contains("WindowGroupLimit"), p.linesIterator.take(12).mkString("\n"))
    assert(!p.contains("CartesianProduct"), p)
    // orders scan reads only the joined/aggregated columns
    assert(!p.contains("o_orderdate") && !p.contains("o_orderpriority"), p)
  }
}
