package graft

import org.apache.spark.sql.SparkSession

/** One place for session config shared by Verify, Bench, and tests.
  *
  * - UTC session time zone: oracle (DuckDB) parity for naive timestamps.
  * - `nanosAsLong`: the driver's events.parquet carries TIMESTAMP(NANOS),
  *   which Spark 4 otherwise rejects ([[Tables.events]] converts to µs).
  * - Shuffle partitions sized to the local core count, not the 200 default —
  *   on a real cluster this would be tuned to cores × executors (or left to
  *   AQE coalescing, which is enabled).
  */
object Session {
  def build(master: String, shufflePartitions: String): SparkSession =
    SparkSession.builder()
      .master(master)
      .withExtensions(graft.functions.DotF32.install)
      .withExtensions(graft.functions.TextHash.install)
      .withExtensions(graft.functions.SampleK.install)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
