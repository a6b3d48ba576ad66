package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The ID-MEMBERSHIP SIDECAR shared by every streaming index maintainer
  * ([[DedupStream]], [[ClusterStream]], [[EmbDedupStream]],
  * [[EmbClusterStream]], [[MediaDedupStream]]): a bucket-partitioned
  * per-index record of WHICH ids the index already holds, so the
  * first-write-wins guard — "never append an id's rows twice" — is a
  * bucket-pruned point lookup instead of a corpus-sized id scan.
  *
  * Why it exists (the r14 verdict's #2 scale finding): every dedup
  * stream used to compute `alreadyIndexed` as
  * `spark.read.parquet(indexDir).select(id).distinct()` — a full
  * column scan of the accumulated index PLUS a corpus-sized distinct
  * shuffle, per micro-batch, regardless of how well the probe itself
  * pruned. At 100 TB that term dominates the batch step. The sidecar
  * applies [[LabelLog]]'s `lb=` point-lookup discipline to index
  * membership: rows live under `_ids/batch=<id>/ib=<bucket>/`, a batch's
  * membership check collects the ≤ [[Buckets]] distinct buckets its ids
  * hash to (bounded driver metadata) and reads ONLY those partitions —
  * and the anti-join needs no distinct at all (anti-join semantics are
  * duplicate-insensitive, and first-write-wins keeps the sidecar at one
  * row per id anyway). The reference analog is the same bounded-registry
  * lookup that drove the BM25 `tb=` layout: the capture registry probes
  * its fixed-size table set instead of rescanning history
  * (ext/_informixcdcmodule.ec:1177-1191).
  *
  * Layout: `<indexDir>/_ids/batch=<batchId>/ib=<bucket>/` — the
  * underscore prefix hides the sidecar from the index's own partition
  * discovery (Spark skips `_`-prefixed children), so
  * `spark.read.parquet(indexDir)` and [[IndexCompaction.compact]] on
  * the index root never see it. Rows carry the id column plus any
  * payload the owner co-locates (the text index stores each doc's
  * shingle-hash set `hs` here — one row per doc — which the Jaccard
  * verify reads back bucket-pruned).
  *
  * Exactly-once follows the owners verbatim: [[append]] OVERWRITES
  * `batch=<id>`, every read excludes the current batch id, so a
  * foreachBatch replay rewrites its own partial and never sees itself
  * as prior state. Compaction: [[compact]] runs the shared
  * write-then-swap on the sidecar root (the `ib=` scheme is an internal
  * partition column, which the rewrite preserves).
  */
private[graft] object IdSidecar {

  /** DEFAULT bucket count of the `ib=` partitioning — consumed only at
    * sidecar CREATION (r16): the live count is per-store metadata
    * ([[BucketMeta]]), stamped per run and read back at lookup/fold
    * time, so raising it never mis-prunes runs written at the old
    * count; this default is FROZEN as the interpretation of unstamped
    * legacy runs. Sized like [[LabelLog.Buckets]]: a membership check
    * of k ids reads at most min(k, count) buckets — at 100 TB raise it
    * per-store via [[BucketMeta.setStore]]. */
  val Buckets = 16

  def root(indexDir: String): String = s"$indexDir/_ids"

  /** The id's bucket at count `n`: xxhash64 (not a plain mod) so ANY id
    * type — the text streams admit non-numeric doc ids — buckets
    * uniformly. */
  def bucket(c: Column, n: Int): Column =
    pmod(xxhash64(c), lit(n.toLong)).cast("int")

  /** True iff `dir` holds at least one `batch=` partial CONTAINING
    * data. The data check matters for partitioned layouts: an EMPTY
    * batch (all rows excluded, or an empty stream trigger) writes a
    * partial holding only `_SUCCESS` — no partition dirs, no schema-
    * bearing part file (unlike a flat empty write) — and a root whose
    * only partials are empty fails schema inference when read. Shared
    * by every maintainer's has-state guard. Listing cost is O(batch
    * dirs), the same walk the caller's read is about to do; compaction
    * keeps that bounded. */
  def hasBatchData(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists { st =>
      st.isDirectory && st.getPath.getName.startsWith("batch=") &&
        fs.listStatus(st.getPath).exists { c =>
          val n = c.getPath.getName
          !n.startsWith("_") && !n.startsWith(".")
        }
    }
  }

  /** True iff the sidecar has at least one non-empty batch partial.
    * (Reading the `_ids` path elicits a cosmetic "All paths were
    * ignored" WARN — Spark flags explicitly-read underscore paths as
    * hidden-looking but returns them unfiltered; the `_graft_planes`
    * convention has the same property.) */
  def exists(spark: SparkSession, indexDir: String): Boolean =
    hasBatchData(spark, root(indexDir))

  /** The ≤ count distinct `ib` values `ids`' id column hashes to at
    * count `n` — the bounded driver metadata that prunes the read. */
  def bucketsOf(ids: DataFrame, idCol: String, n: Int): Seq[Any] =
    BucketMeta.bucketsOf(ids, idCol, n, bucket)

  /** The pruned sidecar scan — `ib` partition-pruned to `ibs`, current
    * batch excluded. Factored out so the plan pins can assert the
    * `ib`/`batch` PartitionFilters reach the scan. `onlyBatches`
    * restricts to one bucket-count group's runs during a count
    * transition (absent on the common single-count store). Returns
    * every stored column (id + co-located payload), `batch`/`ib`
    * dropped. */
  def read(spark: SparkSession, indexDir: String, ibs: Seq[Any],
      excludeBatch: Long,
      onlyBatches: Option[Seq[Long]] = None): DataFrame = {
    val base = spark.read.parquet(root(indexDir))
      .filter(col("batch") =!= excludeBatch)
    onlyBatches.fold(base)(ids => base.filter(col("batch").isin(ids: _*)))
      .filter(col("ib").isin(ibs: _*))
      .drop("batch", "ib")
  }

  /** The count-grouped pruned scan for `ids`' rows: one [[read]] per
    * bucket-count group, each pruned with `ids`' bucket set computed
    * AT THAT GROUP'S COUNT. Single-count stores take the unrestricted
    * fast path (the pinned plan shape).
    *
    * `pre` (r19, guide §1.5): a bucket set ALREADY collected for `ids`'
    * id column at a known count — typically accumulated off the batch's
    * own materializing job ([[graft.operators.Materialize.withIntSets]])
    * so the per-batch membership probe costs no extra collect action. A
    * group whose stamped count matches uses it directly (a SUPERSET of
    * the exact set is fine — pruning reads more partitions, the
    * semi/anti-join consumers filter rows); any other group falls back
    * to the per-group collect, so mixed-count stores stay exact. */
  def readForIds(spark: SparkSession, indexDir: String, idCol: String,
      ids: DataFrame, excludeBatch: Long,
      pre: Option[(Int, Seq[Int])] = None): DataFrame = {
    val groups = BucketMeta.runGroups(spark, root(indexDir), Buckets)
      .toSeq.sortBy(_._1)
    val frames = groups.map { case (n, batchIds) =>
      val ibs = pre.filter(_._1 == n).map(_._2.map(x => x: Any))
        .getOrElse(bucketsOf(ids, idCol, n))
      read(spark, indexDir, ibs, excludeBatch,
        onlyBatches = if (groups.size == 1) None else Some(batchIds))
    }
    if (frames.isEmpty)
      spark.read.parquet(root(indexDir)).drop("batch", "ib").limit(0)
    else frames.reduce(_ unionByName _)
  }

  /** Bucket-pruned membership: the already-indexed ids in the buckets
    * `ids` hash to (a superset of `ids` ∩ index — exactly what a
    * left-anti consumer needs; no distinct, anti-joins don't care).
    * Empty frame when the sidecar doesn't exist yet. `pre` as in
    * [[readForIds]]. */
  def knownIds(spark: SparkSession, indexDir: String, idCol: String,
      ids: DataFrame, excludeBatch: Long,
      pre: Option[(Int, Seq[Int])] = None): DataFrame =
    if (!exists(spark, indexDir)) ids.select(col(idCol)).limit(0)
    else readForIds(spark, indexDir, idCol, ids, excludeBatch, pre)
      .select(col(idCol))

  /** Write the batch's sidecar partial: one row per accepted id (plus
    * any co-located payload columns), `ib`-bucketed at the store's
    * current count and stamped with it, `batch=<id>` OVERWRITE. The
    * pre-write repartition lands each bucket in one task → one file
    * per live bucket (the BM25 postings small-files discipline). */
  def append(rows: DataFrame, idCol: String, indexDir: String,
      batchId: Long): Unit = {
    val spark = rows.sparkSession
    val n = BucketMeta.ensureStore(spark, root(indexDir), Buckets)
    rows.withColumn("ib", bucket(col(idCol), n))
      .repartition(col("ib"))
      .write.mode("overwrite").partitionBy("ib")
      .parquet(s"${root(indexDir)}/batch=$batchId")
    BucketMeta.stampRun(spark, root(indexDir), batchId, n)
  }

  /** Compact the sidecar's batch partials into one (preserving `ib=`) —
    * run alongside the owner index's own compaction, same single-writer
    * discipline. Returns the number of partials folded. */
  def compact(spark: SparkSession, indexDir: String,
      keepNewest: Int = 0): Int =
    if (!exists(spark, indexDir)) 0
    else IndexCompaction.compact(spark, root(indexDir),
      keepNewest = keepNewest,
      // the scheme default resolves unstamped legacy runs into the
      // matching stamped group (an upgraded sidecar still converges)
      defaultBuckets = Some(Buckets))

  /** Size-tiered sidecar fold that RE-BUCKETS every row to `to` `ib=`
    * buckets — the sidecar half of [[DedupStream.rebucketTiered]]'s
    * coarse-partials/fine-base split. Row-local (each row re-hashes its
    * own id), so subset folds stay sound; the output run declares its
    * count via runMeta, which also tells the fold machinery mixing
    * input counts is safe. The id column is detected as the first
    * non-layout column ([[append]] writes it first). */
  def rebucketTiered(spark: SparkSession, indexDir: String, to: Int,
      fanIn: Int = 4, keepNewest: Int = 1,
      maxRunBytes: Long = Long.MaxValue): IndexCompaction.TieredStats = {
    require(to >= 1, s"bucket count must be positive, got $to")
    if (!exists(spark, indexDir))
      return IndexCompaction.TieredStats(0, 0, 0, 0L)
    IndexCompaction.compactTiered(spark, root(indexDir), fanIn,
      keepNewest, maxRunBytes = maxRunBytes,
      transform = df => {
        val idCol = df.columns.filterNot(Set("ib", "batch")).head
        df.withColumn("ib", bucket(col(idCol), to))
      },
      runMeta = Map(BucketMeta.File -> to.toString))
  }
}
