package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every query receives the scale-factor directory at call time, so the same
  * code runs sf0.001 (smoke), sf0.01 (oracle), sf0.1 (bench) — and, on a real
  * cluster, any path. Reads are plain `spark.read.parquet`, which keeps
  * column pruning + predicate pushdown available to Catalyst.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark 4 only
    * reads via `spark.sql.legacy.parquet.nanosAsLong` (set in [[Session]]).
    * Convert to microsecond TimestampType with exact integral FLOOR
    * division (subtract `pmod` first; `div` alone truncates toward zero,
    * which for a pre-1970 negative-epoch nano value would round UP while
    * DuckDB's TIMESTAMP_NS → TIMESTAMP cast floors — 1 µs divergence).
    * No `/`: double division loses precision on 1.7e18-scale nanos. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts",
          timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      case TimestampNTZType =>
        // Newer generators write parquet timestamp[us] without tz, which
        // Spark reads as TIMESTAMP_NTZ. The session TZ is UTC, so a cast
        // to TimestampType is value-preserving and restores the type the
        // query surface expects (unix_micros etc.).
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Redistribute a scan before a CPU-heavy per-row stage (hashing, codec,
    * per-token transforms). The driver's test files are single-row-group
    * parquet, so the scan yields ONE partition regardless of
    * `maxPartitionBytes` — without this, a 32-core box runs the hot stage
    * on one core. On production multi-row-group/multi-file data the scan
    * is already parallel and AQE's coalescing keeps the round-trip cheap;
    * the shuffle payload here is only the narrow input projection, never
    * the expanded intermediate.
    *
    * HASH partitioning on all columns, not round-robin `repartition(n)`:
    * round-robin routing is nondeterministic under task retry, so Spark
    * first SORTS each input partition (`sortBeforeRepartition`, on by
    * default) — here a serial sort of the whole single-partition table
    * on one core. Hash routing is deterministic by construction, skips
    * that sort, and profiles at ~half the round-robin cost on the sf0.1
    * lineitem while spreading uniformly (md5-grade uniformity is not
    * needed — Murmur3 over every column is plenty, and duplicate rows
    * merely co-locate). */
  def spread(s: SparkSession, df: DataFrame): DataFrame =
    df.repartition(s.sparkContext.defaultParallelism, df.columns.map(col): _*)
}
