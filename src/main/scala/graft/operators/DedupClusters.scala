package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Duplicate clustering: the keep-one-per-cluster step that completes the
  * dedup family (north star, SURVEY §2.b). Near-dup pair discovery (MinHash
  * LSH, n-gram Jaccard, embedding sketches) emits an EDGE LIST of candidate
  * pairs; an actual dedup pass must then group transitively-connected
  * documents into clusters and keep one canonical representative per
  * cluster — i.e. connected components over the pair graph. A is a near-dup
  * of B and B of C ⇒ {A,B,C} is one cluster even if (A,C) was never a
  * candidate pair.
  *
  * [[ConnectedComponents.components]] is a Pregel-style min-label
  * propagation with pointer jumping:
  *
  *  - every node starts labeled with itself;
  *  - each round, a node takes the minimum of its own label and its
  *    neighbors' labels (one shuffled join + hash agg on the edge list),
  *    then labels are pointer-jumped (`l(x) ← l(l(x))`, one self-join), so
  *    chains collapse in O(log diameter) rounds instead of O(diameter);
  *  - rounds repeat until a fixpoint (no label changed).
  *
  * The driver loop holds ONLY the changed-count that decides termination —
  * every per-row operation is a distributed join/aggregate, the standard
  * iterative-graph shape on Spark (same as GraphX/Pregel, without needing
  * RDDs). Each round's labels are persisted and the previous round's
  * unpersisted, keeping the lineage one round deep.
  *
  * Scale (100 TB): cost per round is two shuffles keyed by node id — edge
  * join + pointer jump — with map-side partial mins; the label table is one
  * row per document and the edge list is the (much smaller) candidate-pair
  * output of LSH blocking. Dedup-cluster graphs are overwhelmingly tiny
  * components (duplicate groups), so the fixpoint typically lands in 2-4
  * rounds; pointer jumping bounds pathological chains at log₂(n) rounds.
  */
object ConnectedComponents {

  /** Label every node of `nodes(idCol)` with the minimum node id reachable
    * through `edges(srcCol, dstCol)` (undirected; symmetrized internally).
    * Returns (id, component). `maxRounds` is a safety bound — the loop
    * requires convergence before it and fails loudly otherwise.
    *
    * One action per round: a full-scan count over the new label table both
    * materializes its cache COMPLETELY before the previous round's cache is
    * dropped (a limit-style probe could leave it partial) and returns the
    * changed-row count that decides termination — the convergence check
    * costs no extra job. Labels are `localCheckpoint`ed every
    * `checkpointEvery` rounds: the pointer-jump self-join references the
    * previous round's plan TWICE, so the logical plan doubles per round —
    * 2^checkpointEvery nodes between checkpoints — and the checkpoint is
    * what keeps analysis and plan-string costs bounded (the label table is
    * one row per node and already cache-materialized, so the checkpoint
    * itself is cheap). The RESULT is a localCheckpoint too:
    * lineage-free, nothing left in the cache manager — its blocks are
    * released by the ContextCleaner once the caller drops the reference,
    * so no unpersist contract leaks across the API. */
  def components(nodes: DataFrame, idCol: String,
                 edges: DataFrame, srcCol: String, dstCol: String,
                 maxRounds: Int = 50, checkpointEvery: Int = 4): DataFrame = {
    val e0 = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
    val e = e0.union(e0.select(col("b"), col("a")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // `pinned` is always the DataFrame holding the current round's cache
    // (or checkpoint); `labels` the (id, comp) view the next round reads.
    var pinned = nodes.select(col(idCol).as("id"), col(idCol).as("comp"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = pinned
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      // Neighbor min: the smallest label adjacent to each node this round.
      val nbrMin = e.join(labels, e("b") === labels("id"))
        .groupBy(col("a").as("id2")).agg(min(col("comp")).as("nbr_min"))
      val stepped = labels.join(nbrMin, labels("id") === nbrMin("id2"), "left")
        .select(col("id"), col("comp").as("prev"),
          least(col("comp"), coalesce(col("nbr_min"), col("comp"))).as("comp"))
      // Pointer jump: l(x) ← min(l(x), l(l(x))) — follow the label's own
      // label so long chains halve every round.
      val byId = stepped.select(col("id").as("jid"), col("comp").as("jcomp"))
      val next = stepped.join(byId, stepped("comp") === byId("jid"), "left")
        .select(stepped("id"), stepped("prev"),
          least(stepped("comp"), coalesce(col("jcomp"), stepped("comp"))).as("comp"))
        .select(col("id"), col("comp"),
          (col("comp") =!= col("prev")).as("changed"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nChanged =
        next.agg(count(when(col("changed"), lit(1)))).head().getLong(0)
      converged = nChanged == 0L
      pinned.unpersist()
      pinned = next
      labels = next.select(col("id"), col("comp"))
      round += 1
      if (!converged && round % checkpointEvery == 0) {
        val cp = labels.localCheckpoint() // eager: truncates lineage
        pinned.unpersist()
        pinned = cp
        labels = cp
      }
    }
    e.unpersist()
    if (!converged) {
      pinned.unpersist()
      throw new IllegalStateException(
        s"connected components did not converge within $maxRounds rounds")
    }
    val out = labels.localCheckpoint()
    pinned.unpersist()
    out
  }
}

/** Driver-checked query for duplicate clustering (oracle: the same MinHash
  * pair pipeline in DuckDB, closed under a recursive CTE — DuckDB computes
  * true transitive reachability, so any propagation bug here breaks the
  * hash). */
object DedupClusters {

  /** Cluster documents by MinHash near-duplicate connectivity: every
    * document gets its cluster's canonical id (the minimum doc_id in its
    * component — singletons are their own cluster), the cluster size, and
    * a `keep` flag marking the one representative to retain. */
  private def qDupClusters(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.spread(s, Tables.documents(s, d))
    val pairs = LlmQueries.minhashPairsUnordered(
        docs, "doc_id", "text", LlmQueries.JaccardThreshold)
      .select(col("doc_a"), col("doc_b"))
    val nodes = docs.select(col("doc_id"))
    ConnectedComponents.components(nodes, "doc_id", pairs, "doc_a", "doc_b")
      .select(col("id").as("doc_id"), col("comp").as("component"))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("component"))))
      .withColumn("keep", col("doc_id") === col("component"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dup_clusters" -> qDupClusters _
  )

  val oracle: Map[String, String] = Map(
    "q_dup_clusters" ->
      s"""WITH RECURSIVE ${LlmQueries.minhashPairsCte},
         |pairs_ok AS (
         |  SELECT doc_a, doc_b FROM j
         |  WHERE jaccard >= ${LlmQueries.JaccardThreshold}),
         |edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM pairs_ok
         |  UNION ALL
         |  SELECT doc_b AS a, doc_a AS b FROM pairs_ok),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.b, reach.r FROM reach JOIN edges e ON reach.id = e.a),
         |comp AS (
         |  SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id)
         |SELECT doc_id, component,
         |       count(*) OVER (PARTITION BY component) AS cluster_size,
         |       doc_id = component AS keep
         |FROM comp ORDER BY doc_id""".stripMargin
  )
}
