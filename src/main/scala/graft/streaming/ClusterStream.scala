package graft.streaming

import graft.operators.{ConnectedComponents, LlmQueries, Materialize}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** STREAMING text-dedup CLUSTER LABELS (r14) — the composition of the
  * two streaming maintenance verbs the library already owns: per
  * micro-batch, [[DedupStream]]'s pair discovery (probe the persisted
  * signature index with the batch — batch×corpus and batch×batch, never
  * corpus×corpus) feeds a contraction label advance
  * ([[ConnectedComponents.components]] over the O(batch) contracted
  * component graph), so a crawl pipeline gets CONTINUOUS
  * duplicate-cluster labels, not just a pair log: after every batch the
  * maintained label state IS `q_dup_clusters` over everything ingested
  * so far.
  *
  * Index-ALL policy — the one deliberate difference from
  * [[DedupStream]]: that stream's index append drops REJECTED batch
  * docs (its curation policy; rejected docs need no future recall
  * because they are already condemned by the pair log). LABELS need
  * full connectivity: a chain A~B, B~C with A≁C must merge A, B, C
  * into ONE cluster even though B is a duplicate — so every batch doc's
  * signature rows enter the index, and keep/drop is read from the
  * labels (`keep = id == component`), not from index membership. With
  * every doc indexed, a pair (a, b) is discovered exactly when the
  * later of the two arrives, under the same band-collision + exact-
  * Jaccard-verify arithmetic as the batch pipeline — the accumulated
  * pair set equals [[LlmQueries.minhashPairsUnordered]] over the full
  * corpus, and closure commutativity then makes the converged labels
  * equal the batch recompute REGARDLESS of batch boundaries, which is
  * what lets the driver hash-check the stream against
  * `q_dup_clusters`'s own full-recompute oracle (one string for both).
  *
  * LABEL STATE — a log-structured union-find, NOT a per-batch snapshot
  * rewrite. The ER stream can rewrite its whole label snapshot per
  * batch because that snapshot is ENTITY-sized (the catalog is fixed);
  * document cluster labels are CORPUS-sized, so a snapshot-per-batch
  * design would write 100 TB of labels per micro-batch. Instead the
  * state is two append-only, `batch=<id>`-keyed logs:
  *
  *  - `delta/batch=<id>/lb=<id mod B>/` — (id, comp) for THIS batch's
  *    docs only, with the component resolved as of this batch;
  *    internally partitioned by the id bucket `lb`, so point lookups
  *    prune to the touched buckets ([[VectorIndex]]'s `cluster=` /
  *    BM25's `tb=` discipline, applied to labels);
  *  - `alias/batch=<id>/` — (from, to) rows recording each OLD
  *    component id this batch merged away, pointing to the merged
  *    component's new (smaller) id.
  *
  * A doc's current component = its unique delta row's comp, chased
  * through the alias log to a root. Merged component ids never
  * resurrect (a component only grows, and its id is its min member, so
  * a retired id can never become a min again) — alias chains strictly
  * decrease, resolution is a pointer-doubling closure over the
  * alias log alone (O(aliases · log chain), never corpus-sized), and
  * applying the closure to ANY delta generation is sound because a
  * delta's comps are roots as of its batch and aliases at or before
  * that batch cannot name them.
  *
  * Per-batch cost is therefore O(batch), never O(corpus): one batch
  * text pass + the |batch|×bucket band probe + a bucket-pruned point
  * lookup of the pair endpoints' current comps + CC over the O(batch)
  * contracted graph + two O(batch) writes (delta + alias). Nothing
  * corpus-sized is read beyond the probe's index side, and nothing
  * corpus-sized is EVER rewritten.
  *
  * Exactly-once: all four writes are `batch=<id>`-keyed OVERWRITEs, and
  * every read excludes the current batch id — a foreachBatch replay
  * recomputes the same pair set from the same predecessor state and
  * rewrites its own partials verbatim, never double-counts (spec-pinned,
  * including replay ACROSS a compaction).
  *
  * Compaction ([[compactState]]): folds the delta log into one
  * lb-partitioned consolidated partial with the alias closure APPLIED
  * (every comp rewritten to its root), then clears the folded alias
  * partials — [[IndexCompaction.compact]]'s write-then-swap manifest
  * machinery with a fold transform, so a crash anywhere recovers. The
  * newest delta partial stays live (the keep-newest replay headroom,
  * the ErStream keep-2 discipline), and alias cleanup retains the
  * newest alias partial for the same reason; a retained alias re-applied
  * to already-folded rows is a no-op (its `from` ids no longer occur). */
object ClusterStream {

  /** Id-bucket count of the delta log's internal `lb` partitioning —
    * the pruning knob: a point lookup of k ids reads at most
    * min(k, Buckets) buckets. 16 matches the postings layout's default;
    * at 100 TB corpus scale raise it (65k buckets ⇒ a batch's lookup
    * reads ~|batch| row groups) — the layout, reads, and compaction are
    * all parameterized on the column, not the count. */
  val Buckets = 16

  private def deltaRoot(labelsDir: String) = s"$labelsDir/delta"
  private def aliasRoot(labelsDir: String) = s"$labelsDir/alias"

  private val AliasSchema = "from BIGINT, to BIGINT, batch BIGINT"
  private val DeltaSchema = "id BIGINT, comp BIGINT, lb INT, batch BIGINT"

  /** All alias rows from batches strictly below `below`. The explicit
    * schema makes an all-empty log (batches with no merges write empty
    * partials) read as an empty frame instead of failing inference. */
  private def readAliases(s: SparkSession, labelsDir: String,
      below: Long): DataFrame =
    if (ErStream.prevSnapshot(s, aliasRoot(labelsDir), below).isEmpty)
      s.range(0).select(col("id").as("from"), col("id").as("to"))
    else s.read.schema(AliasSchema).parquet(aliasRoot(labelsDir))
      .filter(col("batch") < below).select(col("from"), col("to"))

  private def readDeltas(s: SparkSession, labelsDir: String,
      below: Long): DataFrame =
    s.read.schema(DeltaSchema).parquet(deltaRoot(labelsDir))
      .filter(col("batch") < below)

  /** Transitive root of every alias edge by pointer doubling: each round
    * rewrites `to` to its own alias target when one exists, halving the
    * longest chain. Chains strictly decrease (a merge points to the
    * smaller id) so this terminates; the loop runs over the ALIAS LOG
    * ONLY — merges since the last compaction — never anything
    * corpus-sized. */
  private[streaming] def aliasClosure(aliases: DataFrame): DataFrame = {
    var a = Materialize(aliases.select(col("from"), col("to")).distinct())
    var rounds = 0
    var live = a.limit(1).count() > 0
    while (live) {
      rounds += 1
      require(rounds <= 64,
        s"alias closure did not converge after $rounds doubling rounds")
      val stepped = Materialize(a.as("x")
        .join(a.select(col("from").as("_f"), col("to").as("_t")),
          col("to") === col("_f"), "left")
        .select(col("from"), coalesce(col("_t"), col("to")).as("to"),
          col("_t").isNotNull.as("_hopped")))
      live = stepped.filter(col("_hopped")).limit(1).count() > 0
      a = stepped.select(col("from"), col("to"))
    }
    a
  }

  /** Chase every label's comp through the alias closure. */
  private def resolve(labels: DataFrame, aliases: DataFrame): DataFrame = {
    val cl = aliasClosure(aliases)
      .select(col("from").as("_af"), col("to").as("_at"))
    labels.join(cl, col("comp") === col("_af"), "left")
      .select(col("id"), coalesce(col("_at"), col("comp")).as("comp"))
  }

  /** Current components of `ids` (old docs only — absent ids resolve to
    * nothing and the caller seeds them as singletons): a BUCKET-PRUNED
    * point lookup — the driver collects the ≤ [[Buckets]] distinct `lb`
    * values the ids hash to (bounded metadata, the EmbDedupStream
    * prefix-probe pattern) and the delta read prunes to those
    * partitions, then the alias closure re-points merged comps. */
  private[streaming] def lookupComps(s: SparkSession, labelsDir: String,
      batchId: Long, ids: DataFrame): DataFrame = {
    if (ErStream.prevSnapshot(s, deltaRoot(labelsDir), batchId).isEmpty)
      return ids.select(col("id"), col("id").as("comp")).limit(0)
    resolve(lookupRows(s, labelsDir, batchId, ids),
      readAliases(s, labelsDir, batchId))
  }

  /** The bucket-pruned point-read itself — the lookup's scan frame,
    * shared with the plan pin (which asserts `lb` partition pruning
    * reaches the delta scan). */
  private[streaming] def lookupRows(s: SparkSession,
      labelsDir: String, batchId: Long, ids: DataFrame): DataFrame = {
    val buckets = ids
      .select(pmod(col("id"), lit(Buckets.toLong)).cast("int").as("lb"))
      .distinct().collect().map(_.getInt(0)).toSeq
    if (buckets.isEmpty)
      ids.select(col("id"), col("id").as("comp")).limit(0)
    else readDeltas(s, labelsDir, batchId)
      .filter(col("lb").isin(buckets: _*))
      .join(ids.select(col("id")), Seq("id"), "left_semi")
      .select(col("id"), col("comp"))
  }

  /** One micro-batch step — the foreachBatch body, callable directly
    * for the batch≡stream, chain, replay, and compaction specs. */
  def processBatch(batch: DataFrame, batchId: Long, idCol: String,
      textCol: String, indexDir: String, pairsDir: String,
      labelsDir: String, threshold: Double): Unit = {
    val spark = batch.sparkSession
    graft.functions.TextHash.ensureRegistered(spark)
    // One text pass over the batch; probed AND appended from this.
    val batchSigx = LlmQueries.minhashMaterialized(batch, idCol, textCol)
    val index =
      if (DedupStream.hasParquet(spark, indexDir))
        DedupStream.readIndex(spark, indexDir)
      else LlmQueries.indexRowsFromSig(batchSigx.limit(0))
        .withColumnRenamed("doc_id", idCol)
    val pairs = Materialize(LlmQueries
      .minhashPairsAgainstIndexFromSig(index, idCol, batchSigx, threshold))
    pairs.select(col("doc_a"), col("doc_b"))
      .write.mode("overwrite").parquet(s"$pairsDir/batch=$batchId")
    // Index EVERY batch doc (labels need full connectivity — see header).
    // First-write-wins per id, current batch id excluded so a replay
    // rewrites its own partial instead of treating it as prior state.
    val alreadyIndexed =
      if (DedupStream.hasParquet(spark, indexDir))
        spark.read.parquet(indexDir).filter(col("batch") =!= batchId)
          .select(col(idCol).as("doc_id")).distinct()
      else index.select(col(idCol).as("doc_id")).distinct()
    LlmQueries.indexRowsFromSig(
        batchSigx.join(alreadyIndexed, Seq("doc_id"), "left_anti"))
      .withColumnRenamed("doc_id", idCol)
      .write.mode("overwrite").parquet(s"$indexDir/batch=$batchId")
    // ---- label advance: O(batch) log-structured union-find ----
    // The committed pair partial re-reads from parquet so the closure
    // scans files, not the probe plan a second time.
    val committed = spark.read
      .parquet(s"$pairsDir/batch=$batchId")
      .select(col("doc_a").as("e1"), col("doc_b").as("e2"))
    val batchIds = Materialize(
      batch.select(col(idCol).as("id")).distinct())
    val endpoints = committed.select(col("e1").as("id"))
      .unionByName(committed.select(col("e2").as("id"))).distinct()
    // Old endpoints' current comps: bucket-pruned point lookup. Batch
    // docs seed as themselves (their own delta rows — if replaying —
    // are excluded by the batch < current filter).
    val oldEndpoints = endpoints.join(batchIds, Seq("id"), "left_anti")
    val seeds = Materialize(
      batchIds.select(col("id"), col("id").as("comp")).unionByName(
        lookupComps(spark, labelsDir, batchId, oldEndpoints)))
    // Contract each pair to its endpoints' comps; close the O(batch)
    // contracted graph (ConnectedComponents.closeWithNewEdges's core,
    // inlined because here the RELABEL MAP itself is the output — the
    // full label table must never materialize per batch).
    val ce = Materialize(committed
      .join(seeds.select(col("id").as("_i1"), col("comp").as("_c1")),
        col("e1") === col("_i1"))
      .join(seeds.select(col("id").as("_i2"), col("comp").as("_c2")),
        col("e2") === col("_i2"))
      .filter(col("_c1") =!= col("_c2"))
      .select(col("_c1").as("e1"), col("_c2").as("e2")).distinct())
    val relabel =
      if (ce.isEmpty)
        seeds.select(col("comp").as("_oc"), col("comp").as("_nc")).limit(0)
      else {
        val touched = ce.select(col("e1").as("id"))
          .union(ce.select(col("e2").as("id"))).distinct()
        ConnectedComponents.components(touched, "id", ce, "e1", "e2")
          .select(col("id").as("_oc"), col("comp").as("_nc"))
          .filter(col("_oc") =!= col("_nc"))
      }
    // Alias partial: OLD component ids this batch merged away. A fresh
    // batch seed that merged needs no alias (no prior row references
    // it — ids are ingested once); its delta row below carries the
    // final comp directly. Aliases write BEFORE deltas: the serving
    // reads key on the newest committed DELTA, so a crash between the
    // two leaves the alias partial invisible until the replay rewrites
    // both.
    relabel.join(batchIds, col("_oc") === col("id"), "left_anti")
      .select(col("_oc").as("from"), col("_nc").as("to"))
      .write.mode("overwrite").parquet(s"${aliasRoot(labelsDir)}/batch=$batchId")
    // Delta partial: every batch doc's final comp, bucketed by id for
    // pruned future lookups.
    batchIds.select(col("id"), col("id").as("comp"))
      .join(relabel, col("comp") === col("_oc"), "left")
      .select(col("id"), coalesce(col("_nc"), col("comp")).as("comp"))
      .withColumn("lb", pmod(col("id"), lit(Buckets.toLong)).cast("int"))
      .write.partitionBy("lb").mode("overwrite")
      .parquet(s"${deltaRoot(labelsDir)}/batch=$batchId")
  }

  /** Attach continuous cluster-label maintenance to a streaming frame of
    * documents carrying `idCol` and `textCol`. */
  def start(docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, pairsDir: String, labelsDir: String,
      checkpointDir: String, threshold: Double): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch((b: DataFrame, id: Long) =>
        processBatch(b, id, idCol, textCol, indexDir, pairsDir,
          labelsDir, threshold))
      .start()

  /** The current labels, shaped like `q_dup_clusters`'s output:
    * (doc_id, component, cluster_size, keep). Reads the delta log up to
    * the newest COMMITTED delta partial and chases the alias closure —
    * one linear pass over doc-sized state plus the component window,
    * the serving read (per-batch maintenance never runs this). */
  def clusterLabels(s: SparkSession, labelsDir: String): DataFrame = {
    val last = ErStream.prevSnapshot(s, deltaRoot(labelsDir), Long.MaxValue)
      .getOrElse(throw new IllegalStateException(
        s"no label state under $labelsDir"))
    resolve(readDeltas(s, labelsDir, last + 1).select(col("id"), col("comp")),
        readAliases(s, labelsDir, last + 1))
      .select(col("id").as("doc_id"), col("comp").as("component"))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("component"))))
      .withColumn("keep", col("doc_id") === col("component"))
  }

  /** Fold the label log: consolidate the delta partials into one
    * lb-partitioned partial with the alias closure APPLIED, then clear
    * the folded alias partials. [[IndexCompaction.compact]]'s manifest
    * write-then-swap with a fold transform — crash-recoverable at every
    * step, and the two-phase order is idempotent: a crash after the
    * delta fold but before the alias cleanup leaves aliases whose
    * `from` ids no longer occur anywhere, so re-applying them is a
    * no-op and the next pass sweeps them. The newest delta partial is
    * never folded and the newest alias partial never cleared (replay
    * headroom — the keep-newest discipline); only aliases at or below
    * the newest committed delta fold, so a crashed batch's alias
    * partial (delta not yet written) stays out until its replay
    * commits. Single-writer, run quiesced. Returns the number of delta
    * partials folded. */
  def compactState(s: SparkSession, labelsDir: String): Int = {
    val newest = ErStream.prevSnapshot(s, deltaRoot(labelsDir), Long.MaxValue)
    if (newest.isEmpty) return 0
    val folded = IndexCompaction.compact(s, deltaRoot(labelsDir),
      keepNewest = 1,
      transform = df => {
        val cl = aliasClosure(readAliases(s, labelsDir, newest.get + 1))
          .select(col("from").as("_af"), col("to").as("_at"))
        df.join(cl, col("comp") === col("_af"), "left")
          .select(col("id"),
            coalesce(col("_at"), col("comp")).as("comp"), col("lb"))
      })
    if (folded > 0)
      IndexCompaction.retainSnapshots(s, aliasRoot(labelsDir), keep = 1)
    folded
  }

  /** Driver-checked (`s_cluster_labels`): split the corpus into 4
    * deterministic micro-batches (one parquet file each, streamed with
    * maxFilesPerTrigger=1), run the maintenance stream to completion,
    * COMPACT the label log (so the gate also hash-checks the folded
    * form), and return the labels shaped as the cluster table —
    * hash-checked against `q_dup_clusters`'s full-recompute oracle
    * (stream ≡ recompute is the declared contract, and the oracle is
    * the SAME string). */
  def sClusterLabels(s: SparkSession, d: String): DataFrame = {
    val root = new java.io.File(
      s"/tmp/graft_stream_clusters/${d.replaceAll("[^A-Za-z0-9.]", "_")}")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    val docs = graft.Tables.spread(s, graft.Tables.documents(s, d))
      .select(col("doc_id"), col("text"))
    val docDir = new java.io.File(root, "docs")
    // Batch files are a deterministic function of the input dir — cached
    // across runs; only the stream state resets per run.
    Seq("checkpoint", "index", "pairs", "labels")
      .foreach(n => rm(new java.io.File(root, n)))
    if (!new java.io.File(docDir, "_GRAFT_DOCS").exists()) {
      (0 until 4).foreach { b =>
        docs.filter(expr(s"(doc_id div 4) % 4 = $b"))
          .coalesce(1).write.mode("overwrite")
          .parquet(new java.io.File(docDir, s"b$b").getAbsolutePath)
      }
      new java.io.File(docDir, "_GRAFT_DOCS").createNewFile(): Unit
    }
    val labelsDir = new java.io.File(root, "labels").getAbsolutePath
    start(
      s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"${docDir.getAbsolutePath}/*"),
      "doc_id", "text",
      new java.io.File(root, "index").getAbsolutePath,
      new java.io.File(root, "pairs").getAbsolutePath,
      labelsDir,
      new java.io.File(root, "checkpoint").getAbsolutePath,
      LlmQueries.JaccardThreshold)
      .awaitTermination()
    compactState(s, labelsDir): Unit
    clusterLabels(s, labelsDir).orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_cluster_labels" -> (sClusterLabels _))

  val oracle: Map[String, String] = Map(
    // stream ≡ recompute: the SAME full-corpus oracle as q_dup_clusters
    // and q_cluster_increment — one string for all three forms.
    "s_cluster_labels" -> graft.operators.DedupClusters.oracle("q_dup_clusters"))
}
