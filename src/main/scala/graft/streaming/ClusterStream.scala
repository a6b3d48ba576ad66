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
  * corpus×corpus) feeds [[ErStream]]'s label-snapshot advance
  * ([[ConnectedComponents.closeWithNewEdges]] — contraction over the
  * O(batch) component graph), so a crawl pipeline gets CONTINUOUS
  * duplicate-cluster labels, not just a pair log: after every batch the
  * latest snapshot IS `q_dup_clusters` over everything ingested so far.
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
  * Exactly-once: all three writes are `batch=<id>`-keyed OVERWRITEs (a
  * replay rewrites, never double-counts), the label step reads its
  * predecessor as the largest committed snapshot id < current (the
  * [[ErStream.prevSnapshot]] discipline, Hadoop FS API), the probe
  * excludes the current batch's own (about-to-be-rewritten) index rows,
  * and the index append is first-write-wins per doc id.
  *
  * 100 TB shape: per-batch cost = one batch text pass + the band
  * equi-join probe (|batch| × bucket) + two linear scans of the
  * doc-sized label snapshot + CC over the O(batch) contracted graph.
  * Index/pair partials compact with [[IndexCompaction.compact]];
  * label snapshots retain with [[IndexCompaction.retainSnapshots]] —
  * the same lifecycle verbs as every other maintained state. */
object ClusterStream {

  /** One micro-batch step — the foreachBatch body, callable directly
    * for the batch≡stream and replay specs. */
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
    // Advance the label snapshot by CONTRACTION (the ErStream step):
    // nodes = everything labeled so far ∪ this batch; the committed pair
    // partial re-reads from parquet so the closure scans files, not the
    // probe plan a second time.
    val committed = spark.read.parquet(s"$pairsDir/batch=$batchId")
    val prevLabels = ErStream.prevSnapshot(spark, labelsDir, batchId) match {
      case Some(prev) => spark.read.parquet(s"$labelsDir/batch=$prev")
      case None =>
        batch.select(col(idCol).as("id"), col(idCol).as("comp")).limit(0)
    }
    val nodes = prevLabels.select(col("id"))
      .unionByName(batch.select(col(idCol).as("id"))).distinct()
    ConnectedComponents.closeWithNewEdges(
        ConnectedComponents.seedLabels(nodes, prevLabels),
        committed.select(col("doc_a").as("e1"), col("doc_b").as("e2")))
      .write.mode("overwrite").parquet(s"$labelsDir/batch=$batchId")
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

  /** The latest label snapshot, shaped like `q_dup_clusters`'s output:
    * (doc_id, component, cluster_size, keep). */
  def clusterLabels(s: SparkSession, labelsDir: String): DataFrame = {
    val last = ErStream.prevSnapshot(s, labelsDir, Long.MaxValue).getOrElse(
      throw new IllegalStateException(s"no label snapshot under $labelsDir"))
    s.read.parquet(s"$labelsDir/batch=$last")
      .select(col("id").as("doc_id"), col("comp").as("component"))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("component"))))
      .withColumn("keep", col("doc_id") === col("component"))
  }

  /** Label-snapshot retention — the shared
    * [[IndexCompaction.retainSnapshots]] verb, as for the ER stream. */
  def compactLabels(s: SparkSession, labelsDir: String): Int =
    IndexCompaction.retainSnapshots(s, labelsDir, keep = 2)

  /** Driver-checked (`s_cluster_labels`): split the corpus into 4
    * deterministic micro-batches (one parquet file each, streamed with
    * maxFilesPerTrigger=1), run the maintenance stream to completion,
    * and return the latest snapshot shaped as the cluster table —
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
    clusterLabels(s, labelsDir).orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_cluster_labels" -> (sClusterLabels _))

  val oracle: Map[String, String] = Map(
    // stream ≡ recompute: the SAME full-corpus oracle as q_dup_clusters
    // and q_cluster_increment — one string for all three forms.
    "s_cluster_labels" -> graft.operators.DedupClusters.oracle("q_dup_clusters"))
}
