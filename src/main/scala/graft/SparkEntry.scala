package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a matching `oracleSql` key and is
  * hash-checked by the driver against DuckDB on the same parquet tables —
  * including the streaming CDC pipeline (`s_cdc_pipeline` runs its
  * Structured Streaming query to completion and returns the materialized
  * table) and the binary codec (`q_cdc_roundtrip` encodes and decodes every
  * row on the executors). Non-SQL-expressible invariants (codec round-trip
  * over random schemas, MinHash bounds, exactly-once restart) are covered
  * by the ScalaTest/ScalaCheck specs under src/test.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Latest-row-image-per-key — the semantic heart of CDC materialization
    * (SURVEY.md §7.2). */
  def entry(spark: SparkSession): DataFrame =
    queries("q_latest_per_key")(spark, "/root/testdata/sf0.001")

  /** The per-file registration maps behind [[queries]], exposed so the
    * contract suite can detect a duplicate name silently shadowed by the
    * `++` fold. */
  private[graft] def queryMaps: Seq[Map[String, (SparkSession, String) => DataFrame]] =
    Seq(
      operators.RelationalQueries.queries,
      operators.CdcQueries.queries,
      operators.LlmQueries.queries,
      operators.CodecQueries.queries,
      operators.TemporalJoins.queries,
      operators.FuzzyJoin.queries,
      operators.SeriesOps.queries,
      operators.AuditOps.queries,
      operators.TextSignals.queries,
      operators.BloomJoin.queries,
      operators.SqlSurface.queries,
      operators.CorpusOps.queries,
      operators.DedupClusters.queries,
      operators.RetrievalIndex.queries,
      operators.GraphOps.queries,
      operators.ScaleOps.queries,
      streaming.CdcPipeline.queries,
      streaming.EnrichStream.queries,
      streaming.BloomStream.queries,
      streaming.ErStream.queries,
      streaming.DedupStream.queries,
      streaming.ClusterStream.queries,
      streaming.EmbClusterStream.queries,
      streaming.VectorIndexStream.queries,
      streaming.MediaDedupStream.queries,
      streaming.Bm25Stream.queries,
      streaming.DriftStream.queries,
      streaming.GapStream.queries,
      streaming.TrendStream.queries,
      multimodal.MultimodalOps.queries)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    queryMaps.reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.RelationalQueries.oracle ++
      operators.CdcQueries.oracle ++
      operators.LlmQueries.oracle ++
      operators.CodecQueries.oracle ++
      operators.TemporalJoins.oracle ++
      operators.FuzzyJoin.oracle ++
      operators.SeriesOps.oracle ++
      operators.AuditOps.oracle ++
      operators.TextSignals.oracle ++
      operators.BloomJoin.oracle ++
      operators.SqlSurface.oracle ++
      operators.CorpusOps.oracle ++
      operators.DedupClusters.oracle ++
      operators.RetrievalIndex.oracle ++
      operators.GraphOps.oracle ++
      operators.ScaleOps.oracle ++
      streaming.CdcPipeline.oracle ++
      streaming.EnrichStream.oracle ++
      streaming.BloomStream.oracle ++
      streaming.ErStream.oracle ++
      streaming.DedupStream.oracle ++
      streaming.ClusterStream.oracle ++
      streaming.EmbClusterStream.oracle ++
      streaming.VectorIndexStream.oracle ++
      streaming.MediaDedupStream.oracle ++
      streaming.Bm25Stream.oracle ++
      streaming.DriftStream.oracle ++
      streaming.GapStream.oracle ++
      streaming.TrendStream.oracle ++
      multimodal.MultimodalOps.oracle
}
