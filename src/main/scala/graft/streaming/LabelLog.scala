package graft.streaming

import graft.operators.{ConnectedComponents, Materialize}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The LOG-STRUCTURED UNION-FIND behind every streaming CLUSTER-LABEL
  * maintainer ([[ClusterStream]] for text minhash clusters,
  * [[EmbClusterStream]] for embedding sign-sketch clusters) — the label
  * state itself, independent of how pairs are discovered.
  *
  * Why a log and not a snapshot: the ER stream may rewrite its whole
  * label snapshot per batch because that snapshot is ENTITY-sized (the
  * catalog is fixed); document/vector cluster labels are CORPUS-sized,
  * so a snapshot-per-batch design would rewrite 100 TB of labels per
  * micro-batch. The log writes O(batch) per batch instead:
  *
  *  - `delta/batch=<id>/lb=<id mod B>/` — (id, comp) for THAT batch's
  *    ids only, with the component resolved as of the batch; internally
  *    partitioned by the id bucket `lb`, so point lookups prune to the
  *    touched buckets ([[graft.operators.VectorIndex]]'s `cluster=` /
  *    BM25's `tb=` discipline, applied to labels);
  *  - `alias/batch=<id>/` — (from, to) rows recording each OLD
  *    component id that batch merged away, pointing to the merged
  *    component's new (smaller) id.
  *
  * An id's current component = its unique delta row's comp, chased
  * through the alias log to a root. Merged component ids never
  * resurrect (a component only grows, and its id is its min member, so
  * a retired id can never become a min again) — alias chains strictly
  * decrease, resolution is a pointer-doubling closure over the alias
  * log alone (O(aliases · log chain), never corpus-sized), and applying
  * the closure to ANY delta generation is sound because a delta's comps
  * are roots as of its batch and aliases at or before that batch cannot
  * name them.
  *
  * Exactly-once: both writes are `batch=<id>`-keyed OVERWRITEs and
  * every read excludes the current batch id — a foreachBatch replay
  * recomputes the same advance from the same predecessor state and
  * rewrites its own partials verbatim (spec-pinned by both consumer
  * suites, including replay ACROSS a compaction).
  *
  * Compaction ([[compactState]]): folds the delta log into one
  * lb-partitioned consolidated partial with the alias closure APPLIED
  * (every comp rewritten to its root), then clears the folded alias
  * partials — [[IndexCompaction.compact]]'s write-then-swap manifest
  * machinery with a fold transform, crash-recoverable at every step.
  * The newest delta partial stays live and the newest alias partial is
  * retained (the keep-newest replay headroom); a retained alias
  * re-applied to already-folded rows is a no-op (its `from` ids no
  * longer occur). */
object LabelLog {

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
  private[streaming] def aliasClosure(aliases: DataFrame): DataFrame =
    aliasClosureCounted(aliases)._1

  /** [[aliasClosure]] plus the executed round count — the depth seam the
    * 64-batch suite pins: rounds = ceil(log2(longest chain)) hop rounds
    * + 1 terminal no-hop round, so a linear-chain alias log of length L
    * must close in ~log2(L), never L, rounds. */
  private[streaming] def aliasClosureCounted(
      aliases: DataFrame): (DataFrame, Int) = {
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
    (a, rounds)
  }

  /** The closure round count over the CURRENT alias log — suite seam. */
  private[streaming] def closureRounds(s: SparkSession,
      labelsDir: String): Int =
    aliasClosureCounted(readAliases(s, labelsDir, Long.MaxValue))._2

  /** Chase every label's comp through the alias closure. */
  private def resolve(labels: DataFrame, aliases: DataFrame): DataFrame = {
    val cl = aliasClosure(aliases)
      .select(col("from").as("_af"), col("to").as("_at"))
    labels.join(cl, col("comp") === col("_af"), "left")
      .select(col("id"), coalesce(col("_at"), col("comp")).as("comp"))
  }

  /** Current components of `ids` (old ids only — absent ids resolve to
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

  /** One label advance — the O(batch) union step shared by every
    * consumer: fold `committed` pairs (e1, e2; both endpoints either in
    * `batchIds` or already labeled) into the log for `batchId`.
    * `batchIds` must be the batch's distinct ids. */
  private[streaming] def advance(spark: SparkSession, labelsDir: String,
      batchId: Long, batchIds: DataFrame, committed: DataFrame): Unit = {
    val endpoints = committed.select(col("e1").as("id"))
      .unionByName(committed.select(col("e2").as("id"))).distinct()
    // Old endpoints' current comps: bucket-pruned point lookup. Batch
    // ids seed as themselves (their own delta rows — if replaying —
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
    // Delta partial: every batch id's final comp, bucketed for pruned
    // future lookups.
    batchIds.select(col("id"), col("id").as("comp"))
      .join(relabel, col("comp") === col("_oc"), "left")
      .select(col("id"), coalesce(col("_nc"), col("comp")).as("comp"))
      .withColumn("lb", pmod(col("id"), lit(Buckets.toLong)).cast("int"))
      .write.partitionBy("lb").mode("overwrite")
      .parquet(s"${deltaRoot(labelsDir)}/batch=$batchId")
  }

  /** The current labels, shaped like the cluster queries' output:
    * (<idCol>, component, cluster_size, keep). Reads the delta log up to
    * the newest COMMITTED delta partial and chases the alias closure —
    * one linear pass over corpus-sized state plus the component window,
    * the serving read (per-batch maintenance never runs this). */
  private[streaming] def serve(s: SparkSession, labelsDir: String,
      idCol: String): DataFrame = {
    val last = ErStream.prevSnapshot(s, deltaRoot(labelsDir), Long.MaxValue)
      .getOrElse(throw new IllegalStateException(
        s"no label state under $labelsDir"))
    resolve(readDeltas(s, labelsDir, last + 1).select(col("id"), col("comp")),
        readAliases(s, labelsDir, last + 1))
      .select(col("id").as(idCol), col("comp").as("component"))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("component"))))
      .withColumn("keep", col(idCol) === col("component"))
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
  private[streaming] def compactState(s: SparkSession,
      labelsDir: String): Int = {
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

  /** Size-tiered fold of the DELTA log — the label state's bounded-
    * barrier maintenance verb ([[IndexCompaction.compactTiered]]
    * applied where it is sound). An IDENTITY subset fold of delta
    * partials preserves every read: ids are ingested once, so the
    * delta log holds exactly one row per id and is union-read — a
    * folded run serves the same row set, `lb=` pruning is preserved
    * per fold, and each row's comp still resolves through the
    * UNTOUCHED alias log exactly as before. `keepNewest = 1` keeps the
    * newest committed delta partial out (the replay guard — a replayed
    * batch must not see its own rows), matching [[compactState]].
    *
    * What this verb deliberately does NOT do: apply the alias closure
    * or clear alias partials. The contraction itself is row-local, but
    * CLEARING an alias is only sound once no surviving delta row still
    * names its `from` comp — which requires having folded every
    * non-newest delta partial, i.e. the monolithic [[compactState]].
    * The hybrid schedule this enables: tiered folds bound the delta
    * run listing continuously (each one rewrites at most `fanIn`
    * similar-sized runs — never the corpus-sized label rewrite the
    * monolithic fold pays), and the alias-clearing contraction runs at
    * a much longer cadence, sized by alias-log growth (merge events,
    * not corpus rows). compactState composes over tiered-folded runs
    * unchanged (negative run ids fold again like any other). */
  private[streaming] def compactStateTiered(s: SparkSession,
      labelsDir: String, fanIn: Int = 4,
      maxRunBytes: Long = Long.MaxValue): IndexCompaction.TieredStats =
    IndexCompaction.compactTiered(s, deltaRoot(labelsDir),
      fanIn = fanIn, keepNewest = 1, maxRunBytes = maxRunBytes)
}
