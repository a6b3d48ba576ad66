package graft.operators

import org.apache.spark.sql.DataFrame

/** One-shot lineage-truncating materialization, shared by every operator
  * that computes an intermediate ONCE and references it from several plan
  * branches (MinHash signatures, SimHash fingerprints, IVF assignments,
  * streaming dedup probes).
  *
  * Mode follows [[DedupClusters.components]]' convention: with a session
  * checkpoint directory set (`spark.sparkContext.setCheckpointDir`) the
  * materialization is a RELIABLE `df.checkpoint()`. That is the 100 TB
  * form — `localCheckpoint` pins unreplicated blocks on executors, so on
  * a real cluster one executor loss (or a dynamic-allocation
  * decommission) mid-query makes the intermediate unrecoverable and
  * fails the job, and the materialized table belongs in fault-tolerant
  * storage anyway. Without a checkpoint dir it falls back to the
  * executor-local form: zero setup, the right trade for stable clusters
  * and local runs.
  *
  * Unlike the CC loop there is a single materialization per call, so no
  * per-round file rotation is needed. Spark never auto-deletes reliable
  * checkpoint files; they live under the context-UUID-scoped directory
  * until the deployment's retention policy cleans it — the same contract
  * as the final round of [[DedupClusters.components]].
  */
private[graft] object Materialize {
  def apply(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isEmpty)
      df.localCheckpoint()
    else df.checkpoint()
}
