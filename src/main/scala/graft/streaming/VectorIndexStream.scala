package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Continuous maintenance of the PERSISTED ANN index — the
  * [[DedupStream]]/[[EmbDedupStream]] batch→state→append pattern applied
  * to [[graft.api.Graft.writeVectorIndex]]'s serving layout, so a vector
  * ingest keeps the partition-pruned index current without ever
  * re-assigning the corpus.
  *
  * Layout: part files under `batch=<id>/cluster=<c>/` (+
  * `_graft_centroids` beside it, hidden from partition discovery;
  * same layout either side of the swap). Every batch directory is
  * internally partitioned by the SAME centroid set, so
  * [[graft.api.Graft.probeVectorIndex]] prunes `cluster=` directories
  * across all batches at once — probe cost stays per-bucket as the index
  * grows, and append cost is O(|batch|), never O(|index|).
  *
  * The centroid set is FIXED AT INDEX CREATION (the IVF analog of
  * [[EmbDedupStream]]'s persisted planes): the first batch trains it
  * ([[graft.api.Graft.trainIvfCentroids]], K = ⌈√|batch|⌉ by default)
  * and persists it beside the index; every later batch assigns against
  * the STORED centroids. Vectors do not move between buckets as data
  * arrives — exactly the reference's bounded-state principle
  * (ec:2104-2194: resume from saved state, never re-derive from
  * history). Production re-trains by building a fresh index directory
  * and swapping, never by mutating a live one.
  *
  * Exactly-once: each micro-batch OVERWRITES its own `batch=<id>`
  * directory, so foreachBatch retries and checkpoint replays rewrite the
  * same files instead of duplicating rows. */
object VectorIndexStream {

  private def centroidsPath(indexDir: String) = s"$indexDir/_graft_centroids"

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** The index's fixed centroid table (cid, cv, cnorm), once created. */
  def readCentroids(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(centroidsPath(indexDir))

  /** Read the accumulated index (idCol, vecCol, …, cluster). */
  def readIndex(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(indexDir).drop("batch")

  /** One micro-batch step — the foreachBatch body, callable directly for
    * batch-driven ingestion. Returns the batch's assigned rows. */
  def processBatch(batch: DataFrame, batchId: Long, idCol: String,
                   vecCol: String, indexDir: String, k: Int = 0,
                   iters: Int = 2): DataFrame = {
    val spark = batch.sparkSession
    // Centroid bootstrap: the first batch trains and persists the
    // codebook for the index's lifetime. Training is deterministic
    // (lowest-id seeds, unrolled Lloyd's), so a replay of the creating
    // batch rewrites identical centroids — idempotent.
    if (!exists(spark, centroidsPath(indexDir)))
      graft.api.Graft.trainIvfCentroids(batch, idCol, vecCol, k, iters)
        .write.mode("overwrite").parquet(centroidsPath(indexDir))
    val cents = readCentroids(spark, indexDir)
    val assigned = graft.api.Graft
      .ivfAssign(batch, idCol, vecCol, cents, "cid", "cv")
    assigned.write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$indexDir/batch=$batchId")
    assigned
  }

  /** Attach continuous index maintenance to a streaming Dataset of
    * vectors carrying `idCol` and an `Array[Float]` `vecCol`. */
  def start(vectors: DataFrame, idCol: String, vecCol: String,
            indexDir: String, checkpointDir: String, k: Int = 0,
            iters: Int = 2): StreamingQuery =
    vectors.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch((b: DataFrame, id: Long) =>
        processBatch(b, id, idCol, vecCol, indexDir, k, iters): Unit)
      .start()
}
