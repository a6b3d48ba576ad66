package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets

/** BUCKET-COUNT METADATA for the partition-pruned index layouts (r16 —
  * r15 verdict #3): the internal bucket fan-outs (`bb=` band store,
  * `ib=` id sidecar, `lb=` label deltas) used to be compile-time
  * constants shared by writer and reader. That is a silent-recall
  * hazard, not a perf knob: the scaladocs all say "raise it at 100 TB",
  * but a reader pruning with a NEW count against runs written with an
  * OLD count reads the wrong partitions and silently LOSES candidates —
  * wrong answers, not slow ones. So the count becomes data, the
  * `_graft_planes` convention applied to layout arithmetic:
  *
  *  - `<root>/_graft_buckets` — the STORE count: what new runs are
  *    written at. Created with the scheme's default on first write;
  *    raising it ([[setStore]]) affects only future runs.
  *  - `<root>/batch=<id>/_graft_buckets` — the RUN count: what THIS
  *    run's internal partitioning was hashed with. Every writer stamps
  *    it beside the run's data; a fold output is stamped by
  *    [[IndexCompaction]]'s affinity machinery (runs of different
  *    counts never merge — their bucket values live in different hash
  *    spaces) or by the caller's re-bucketing transform.
  *
  * Readers group runs BY COUNT ([[runGroups]]) and prune each group
  * with the bucket set computed at that group's count — per-group
  * scans, each partition-pruned on both `batch` and the bucket column.
  * The common single-count store takes a fast path that is BIT-
  * IDENTICAL to the pre-metadata plan (one scan, plain `isin`), which
  * the plan-pin suites assert.
  *
  * Legacy runs without a stamp read at `default` — the scheme's
  * constant, which is therefore FROZEN as the legacy interpretation:
  * raising a default constant in code would re-interpret unstamped
  * runs; raise counts per-store via [[setStore]] instead. */
private[graft] object BucketMeta {

  val File = "_graft_buckets"

  private def fsOf(spark: SparkSession, root: String): (FileSystem, Path) = {
    val p = new Path(root)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def readInt(fs: FileSystem, p: Path): Option[Int] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
        Some(new String(out.toByteArray, StandardCharsets.UTF_8).trim.toInt)
      } finally in.close()
    }

  private def writeInt(fs: FileSystem, p: Path, n: Int): Unit = {
    val out = fs.create(p, true)
    try out.write(n.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The count NEW runs of `root` are written at: the store file, else
    * `default`. */
  def storeCount(spark: SparkSession, root: String, default: Int): Int = {
    val (fs, rp) = fsOf(spark, root)
    readInt(fs, new Path(rp, File)).getOrElse(default)
  }

  /** Record the store count (creation, or a raise-at-scale). Only
    * future runs are affected; existing runs keep their stamps and
    * readers keep pruning them correctly — they converge to the new
    * count as compaction re-buckets or affinity-folds them. */
  def setStore(spark: SparkSession, root: String, n: Int): Unit = {
    require(n >= 1, s"bucket count must be positive, got $n")
    val (fs, rp) = fsOf(spark, root)
    if (!fs.exists(rp)) fs.mkdirs(rp): Unit
    writeInt(fs, new Path(rp, File), n)
  }

  /** Stamp a freshly written run with the count its partitions were
    * hashed with. The run write is a `batch=<id>` OVERWRITE (replay
    * rewrites both data and stamp), so no swap discipline is needed.
    * Crash window, stated: a crash between the data write and this
    * stamp leaves a committed run that reads at the frozen default
    * until its batch replays (which rewrites data + stamp together).
    * On a store still at the default — every store that has never been
    * raised — the window is a no-op; on a raised store it can
    * under-prune or mis-prune THAT ONE RUN for reads issued during the
    * crash downtime, healed by the replay. (Stamping first is not an
    * option: the overwrite mode deletes the directory.) */
  def stampRun(spark: SparkSession, root: String, batchId: Long,
      n: Int): Unit = {
    val (fs, rp) = fsOf(spark, root)
    writeInt(fs, new Path(new Path(rp, s"batch=$batchId"), File), n)
  }

  /** A run's count: its stamp, else `default` (the frozen legacy
    * interpretation). */
  def runCount(spark: SparkSession, root: String, dirName: String,
      default: Int): Int = {
    val (fs, rp) = fsOf(spark, root)
    readInt(fs, new Path(new Path(rp, dirName), File)).getOrElse(default)
  }

  /** Per-JVM stamp cache for [[runGroups]]'s hot probe path, keyed on
    * (path, mtime, len). The key is only sound once the file has
    * SETTLED: an in-place rewrite (a batch replay re-running
    * [[stampRun]] at the same path, or a refold landing after the
    * root was deleted and recreated) can produce the same path, the
    * same 1-2-byte length, and — under coarse store mtime granularity
    * (seconds on S3A) — the same mtime, aliasing a stale entry. So
    * stamps younger than [[SettleMs]] BYPASS the cache entirely (read
    * directly, never inserted, never looked up): within the window a
    * rewrite can never be served stale, and after it the rewrite's
    * fresh mtime is a distinct key. The bypass costs one tiny-file
    * read per probe on fresh runs only — exactly the pre-cache
    * behavior — and assumes writer/store clock skew below SettleMs.
    * Bounded defensively — fixture roots accumulate across a long
    * JVM. */
  private val stampCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), Int]()
  private val SettleMs = 60000L

  /** Committed run ids grouped by their count — the read-side planning
    * metadata (bounded: one tiny file per run, run count is bounded by
    * compaction). ONE child listing per run yields commit status and
    * the stamp entry together (instead of two exists probes plus an
    * open — a real per-batch latency term on object stores), and stamp
    * CONTENT reads hit the per-JVM cache. */
  def runGroups(spark: SparkSession, root: String,
      default: Int): Map[Int, Seq[Long]] = {
    val (fs, rp) = fsOf(spark, root)
    if (!fs.exists(rp)) return Map.empty
    fs.listStatus(rp).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .flatMap { st =>
        val children = fs.listStatus(st.getPath)
        if (!children.exists(_.getPath.getName == "_SUCCESS")) None
        else {
          val n = children.find(_.getPath.getName == File) match {
            case Some(f)
                if f.getModificationTime >
                  System.currentTimeMillis() - SettleMs =>
              // unsettled stamp: an in-place rewrite could alias the
              // (path, mtime, len) key — read it, don't cache it
              readInt(fs, f.getPath).getOrElse(default)
            case Some(f) =>
              if (stampCache.size > 65536) stampCache.clear()
              stampCache.computeIfAbsent(
                (f.getPath.toString, f.getModificationTime, f.getLen),
                _ => readInt(fs, f.getPath).getOrElse(default))
            case None => default
          }
          Some(n -> st.getPath.getName.stripPrefix("batch=").toLong)
        }
      }
      .groupBy(_._1)
      .map { case (n, xs) => n -> xs.map(_._2) }
  }

  /** Read-or-create: the store count, stamping the default at first
    * use so a store created today is self-describing even if the
    * scheme's default changes later. */
  def ensureStore(spark: SparkSession, root: String, default: Int): Int = {
    val (fs, rp) = fsOf(spark, root)
    readInt(fs, new Path(rp, File)).getOrElse {
      setStore(spark, root, default)
      default
    }
  }

  /** The distinct buckets `keys`' column hashes to at count `n` under
    * `hash` — the bounded driver metadata each probe collects, shared
    * so every scheme computes it the same way. */
  def bucketsOf(keys: DataFrame, keyCol: String, n: Int,
      hash: (Column, Int) => Column): Seq[Any] =
    keys.select(hash(col(keyCol), n).as("b")).distinct()
      .collect().map(_.get(0)).toSeq
}
