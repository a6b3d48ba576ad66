package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) similarity join — the entity-resolution /
  * record-linkage operator: match dirty string mentions against a clean
  * catalog under edit distance ≤ 1 without comparing every pair.
  *
  * The naive plan is mentions × catalog with `levenshtein` on every pair —
  * quadratic, a non-starter at 100 TB. This is the segment (pigeonhole)
  * blocking of the PassJoin family: split every catalog name into 2
  * disjoint segments; ONE edit cannot touch both, so any mention within
  * distance 1 must contain one segment EXACTLY — seg1 as its prefix (edit
  * fell in seg2) or seg2 as its suffix (edit fell in seg1). Candidates are
  * therefore a plain EQUI-JOIN on (catalog length, segment no, segment
  * text); the mention side probes each compatible catalog length
  * (|Δlen| ≤ 1 → ≤ 3 lengths × 2 segments = ≤ 6 keys per mention), and the
  * exact `levenshtein` verify runs map-side on the surviving candidates
  * only. Zero false negatives by the pigeonhole argument (spec-checked
  * against the brute-force cross join), never all-pairs: the join is
  * AQE-sizeable, fan-out per key is the number of catalog entries sharing
  * a half-name at one exact length.
  */
object FuzzyJoin {

  /** Segment-blocked edit-distance-≤-1 join, the ONE implementation behind
    * the driver query and [[graft.api.Graft.fuzzyJoin]].
    *
    * @param catalog  clean side: one row per entity, `catId` + `catName`
    * @param mentions dirty side: `menId` + `menName`
    * @return (menId, catId, dist) for every pair with
    *         levenshtein(menName, catName) ≤ 1, dist ∈ {0, 1}
    */
  def editJoin1(catalog: DataFrame, catId: String, catName: String,
      mentions: DataFrame, menId: String, menName: String): DataFrame = {
    // Catalog side: 2 segment rows per entity. seg1 = first l div 2 chars,
    // seg2 = the rest; keys carry the FULL name for the verify step.
    val eseg = catalog
      .select(col(catId).as("_cid"), col(catName).as("_cname"),
        length(col(catName)).as("l"))
      .select(col("_cid"), col("_cname"), col("l"),
        explode(array(
          struct(lit(1).as("segno"),
            expr(s"substring(_cname, 1, l div 2)").as("seg")),
          struct(lit(2).as("segno"),
            expr(s"substring(_cname, l div 2 + 1)").as("seg")))).as("_s"))
      .select(col("_cid"), col("_cname"), col("l"),
        col("_s.segno").as("segno"), col("_s.seg").as("seg"))
    // Mention side: for each compatible catalog length l (own length ± 1),
    // the prefix of l div 2 chars (segno 1) and the suffix of l - l div 2
    // chars (segno 2). greatest(…, 1) only guards degenerate tiny strings
    // — Spark and DuckDB disagree on non-positive substring starts, so
    // the clamp keeps the formula engine-portable.
    val mkey = mentions
      .select(col(menId).as("_mid"), col(menName).as("_mname"))
      .select(col("_mid"), col("_mname"),
        explode(expr("transform(sequence(-1, 1), dl -> length(_mname) + dl)"))
          .as("l"))
      .filter(col("l") >= 2)
      .select(col("_mid"), col("_mname"), col("l"),
        explode(array(lit(1), lit(2))).as("segno"))
      .withColumn("seg",
        when(col("segno") === 1, expr("substring(_mname, 1, l div 2)"))
          .otherwise(expr(
            "substring(_mname, greatest(length(_mname) - (l - l div 2) + 1, 1))")))
    // Verify BEFORE deduplicating: a candidate pair appears at most twice
    // (once per surviving segment), so pre-verify dedup would shuffle
    // ~every candidate with both full name strings to save almost
    // nothing; verifying first shrinks the stream to true matches and the
    // dedup shuffles 3 integers per row. The THRESHOLD levenshtein form
    // runs the banded O(len·τ) DP and early-exits at τ+1 (returns -1) —
    // the full O(len²) DP on every candidate was the hot stage.
    mkey.join(eseg, Seq("l", "segno", "seg"))
      .select(col("_mid").as(menId), col("_cid").as(catId),
        levenshtein(col("_mname"), col("_cname"), 1).cast("bigint").as("dist"))
      .filter(col("dist") >= 0)
      .distinct()
  }

  /** Driver binding: catalog = the distinct composite part identity
    * (brand + name + type, canonical id = min partkey); mentions = every
    * part row with a DETERMINISTIC single-char deletion for odd partkeys
    * (position keyed by the partkey — the in-plan dirty-data manufacture
    * pattern of q_heavy_hitters). Even-key mentions match their entity at
    * dist 0, odd at dist 1, plus whatever genuine ambiguity the deletion
    * creates — all of it exact, spec-pinned lossless vs brute force. */
  private def qFuzzyJoin(s: SparkSession, d: String): DataFrame = {
    val part = Tables.part(s, d)
      .select(col("p_partkey"),
        concat_ws(" ", col("p_brand"), col("p_name"), col("p_type")).as("n"))
    val catalog = part.groupBy(col("n").as("ename"))
      .agg(min(col("p_partkey")).as("entity_id"))
    val mentions = part.select(col("p_partkey").as("mention_id"),
      when(col("p_partkey") % 2 === 1,
        expr("concat(substring(n, 1, p_partkey % length(n)), " +
          "substring(n, p_partkey % length(n) + 2))"))
        .otherwise(col("n")).as("mname"))
    // No materialization needed before the ORDER BY: the dedup exchange
    // directly below it is an AQE stage boundary, so range partitioning
    // samples the already-materialized shuffle output instead of
    // re-executing the candidate+verify chain.
    editJoin1(catalog, "entity_id", "ename", mentions, "mention_id", "mname")
      .orderBy(col("mention_id"), col("entity_id"))
  }

  /** End-to-end ENTITY RESOLUTION (r11): the three-stage pipeline every
    * record-linkage deployment runs, composed from the engine's own
    * operators — (1) BLOCK + VERIFY: segment-blocked edit-≤-1 candidate
    * pairs ([[editJoin1]], never all-pairs); (2) CLUSTER: connected
    * components over the ENTITY PROJECTION of the link graph
    * ([[ConnectedComponents.components]] — two entities claimed by one
    * ambiguous mention merge transitively, the classic ER closure);
    * (3) SURVIVORSHIP: one canonical entity per cluster, the entity with
    * the most supporting mentions (ties to the smallest id — a total
    * order). Output: every dirty mention with its cluster and resolved
    * canonical entity — the golden-record assignment table.
    *
    * 100 TB shape: stage 1 is the equi-join blocking (pair stream ≈
    * matches, not mentions × catalog); the pair list MATERIALIZES once
    * and feeds the projection, assignment, and support counts (without
    * it the whole blocking chain re-executes per consumer). The CC does
    * NOT run over the bipartite link graph — it runs over its ENTITY
    * PROJECTION (entities sharing an ambiguous mention, a pairs⋈pairs
    * equi-join on the mention key): unambiguous mentions (the
    * overwhelming majority) project to NO edge, so the CC loop's
    * edge-touched node set is only the genuinely conflicted entities —
    * near-empty on a realistically-sparse catalog — instead of every
    * mention. A mention's entities are all
    * connected through the mention itself, so assigning each mention
    * the min component over its linked entities is exact. Survivorship
    * is one component-keyed argmax as a lexicographic struct max
    * (partial+final, no window over members). Names never ride a
    * shuffle after the verify. */
  private def qErPipeline(s: SparkSession, d: String): DataFrame = {
    val (catalog, mentions) = erFixture(s, d)
    resolve(catalog, "entity_id",
      editJoin1(catalog, "entity_id", "ename", mentions, "mention_id", "mname"))
  }

  /** Batch resolution over a canonical link table `pairs(mention_id,
    * entity_id, …)` — the reusable form behind [[qErPipeline]] and
    * [[graft.api.Graft.erResolve]]. Materializes the link table once
    * (it feeds the projection, assignment, and support counts). */
  private[graft] def resolve(entities: DataFrame, idCol: String,
      pairs: DataFrame): DataFrame = {
    val p = Materialize(pairs)
    resolveTail(p, erLabels(entities, idCol, p))
  }

  /** Entity-component labels `(id, comp)` of a link table: connected
    * components over its entity projection — the persistable half of the
    * incremental-ER state. */
  private[graft] def erLabels(entities: DataFrame, idCol: String,
      pairs: DataFrame): DataFrame =
    ConnectedComponents.components(entities.select(col(idCol).as("id")),
      "id", entityProjection(pairs), "e1", "e2")

  /** ER-side alias of the shared incremental closure — see
    * [[ConnectedComponents.closeWithNewEdges]]. */
  private[graft] def closeWithNewEdges(oldLabels: DataFrame,
      newEdges: DataFrame): DataFrame =
    ConnectedComponents.closeWithNewEdges(oldLabels, newEdges)

  /** Incremental resolution: yesterday's state (`oldPairs` + `oldLabels`,
    * both persisted from a prior [[resolve]]/[[erLabels]] run) + the new
    * batch's link table. Old connectivity enters via [[closeWithNewEdges]]
    * contraction; only the new batch's entity projection is computed
    * fresh. */
  private[graft] def resolveIncrement(entities: DataFrame, idCol: String,
      oldPairs: DataFrame, oldLabels: DataFrame,
      newPairs: DataFrame): DataFrame = {
    val np = Materialize(newPairs)
    // Entities added since the last run enter as singletons — the state
    // stays valid under catalog growth, not just mention growth.
    val base = ConnectedComponents.seedLabels(
      entities.select(col(idCol)), oldLabels)
    val comp = closeWithNewEdges(base, entityProjection(np))
    resolveTail(oldPairs.unionByName(np.select(oldPairs.columns.map(col): _*)),
      comp)
  }

  /** RETRACTION — the takedown leg of incremental ER (r13): remove a
    * batch of mentions from yesterday's resolved state WITHOUT
    * re-blocking or re-closing the corpus. Deleting a mention can SPLIT
    * a component (the deleted mention may be the only bridge between two
    * entities), which no edge-monotone increment can express — so the
    * affected components re-close from scratch, but ONLY them:
    * components are mention-closed (a mention's entities always share a
    * component), so the re-closure subgraph is exactly the components
    * touched by a deleted mention — bounded by the deleted batch's
    * neighborhood, never the corpus. Untouched components keep their
    * labels verbatim. Exact: closure restricted to a union of whole
    * components equals the global closure restricted there.
    *
    * 100 TB shape: one anti-join prunes the link log (linear, id-only
    * columns), the affected-component set is O(deleted batch), the CC
    * runs over only those components' kept links, and the tail is the
    * usual linear re-aggregation. GDPR-takedown economics: cost follows
    * the deletion, not the corpus. */
  private[graft] def resolveRetract(entities: DataFrame, idCol: String,
      oldPairs: DataFrame, oldLabels: DataFrame, deleted: DataFrame,
      delCol: String): DataFrame = {
    val del = deleted.select(col(delCol).as("_dmid"))
    val delPairs = oldPairs
      .join(del, col("mention_id") === col("_dmid"), "left_semi")
    val keptPairs = Materialize(oldPairs
      .join(del, col("mention_id") === col("_dmid"), "left_anti"))
    val affected = Materialize(delPairs.select(col("entity_id")).distinct()
      .join(oldLabels.select(col("id").as("entity_id"), col("comp")),
        Seq("entity_id"))
      .select(col("comp")).distinct())
    val subNodes = oldLabels
      .join(affected, Seq("comp"), "left_semi").select(col("id"))
    val subPairs = keptPairs
      .join(subNodes.select(col("id").as("entity_id")), Seq("entity_id"),
        "left_semi")
    val subLabels = ConnectedComponents.components(subNodes, "id",
      entityProjection(subPairs), "e1", "e2")
    val newLabels = oldLabels.join(affected, Seq("comp"), "left_anti")
      .select(col("id"), col("comp"))
      .unionByName(subLabels)
    resolveTail(keptPairs, newLabels)
  }

  /** Driver ER fixture shared by `q_er_pipeline` and `q_er_increment`:
    * catalog = distinct composite part identities on the quarter-table
    * slice (realistic name-space density — see [[fuzzyPairsCte]]);
    * mentions = every slice row, with a deterministic single-char
    * deletion for `p_partkey % 8 = 4`. One definition, so the batch and
    * incremental resolvers can never drift onto different inputs. */
  private[graft] def erFixture(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val part = Tables.part(s, d)
      .filter(col("p_partkey") % 4 === 0)
      .select(col("p_partkey"),
        concat_ws(" ", col("p_brand"), col("p_name"), col("p_type")).as("n"))
    val catalog = part.groupBy(col("n").as("ename"))
      .agg(min(col("p_partkey")).as("entity_id"))
    val mentions = part.select(col("p_partkey").as("mention_id"),
      when(col("p_partkey") % 8 === 4,
        expr("concat(substring(n, 1, p_partkey % length(n)), " +
          "substring(n, p_partkey % length(n) + 2))"))
        .otherwise(col("n")).as("mname"))
    (catalog, mentions)
  }

  /** Entity projection of a (mention_id, entity_id) link table: one
    * undirected edge per entity pair claimed by the same mention — the
    * pairs⋈pairs equi-join on the mention key. Unambiguous mentions (the
    * overwhelming majority) project to NO edge. */
  private[graft] def entityProjection(pairs: DataFrame): DataFrame =
    pairs.select(col("mention_id"), col("entity_id").as("e1"))
      .join(pairs.select(col("mention_id"), col("entity_id").as("e2")),
        Seq("mention_id"))
      .filter(col("e1") < col("e2"))
      .select(col("e1"), col("e2")).distinct()

  /** Shared resolution tail: mention→component assignment (min component
    * over the mention's linked entities — exact, the mention connects
    * them all), cluster sizes, and survivorship (max support, ties to
    * smallest id, as a lexicographic struct max — partial+final, no
    * window over members). Linear aggregations over the link table. */
  private[graft] def resolveTail(pairs: DataFrame, comp: DataFrame): DataFrame = {
    val mres = pairs
      .join(comp.select(col("id").as("entity_id"), col("comp")),
        Seq("entity_id"))
      .groupBy(col("mention_id")).agg(min(col("comp")).as("component"))
    val csize = mres.groupBy(col("component"))
      .agg(count(lit(1)).as("cluster_size"))
    val reps = pairs.groupBy(col("entity_id")).agg(count(lit(1)).as("_n"))
      .join(comp.select(col("id").as("entity_id"),
        col("comp").as("component")), Seq("entity_id"))
      .groupBy(col("component"))
      .agg(max(struct(col("_n").as("_q"), (-col("entity_id")).as("_nid")))
        .as("_m"))
      .select(col("component"), (-col("_m._nid")).as("rep_entity"))
    mres.join(csize, Seq("component")).join(reps, Seq("component"))
      .select(col("mention_id"), col("component"), col("cluster_size"),
        col("rep_entity"))
      .orderBy(col("mention_id"))
  }

  /** Yesterday's persisted ER state for [[qErIncrement]]: the verified
    * link table and the entity-component labels of the corpus minus the
    * incoming `(mention_id div 4) % 5 = 4` batch — standing in for the
    * previous run's outputs (the [[DedupClusters.LabelBase]] /
    * CdcQueries MvBase discipline; first call in a JVM pays the build,
    * covered by the bench warm-up). Production ER deployments persist
    * exactly these two tables: re-blocking the whole corpus per batch is
    * the thing incremental ER exists to avoid. */
  private[graft] object ErBase {
    def ensure(s: SparkSession, d: String): (String, String) = {
      val root = FixtureBase.ensure("graft_er_base", 1, d,
          Seq("pairs", "labels")) { r =>
        val (catalog, mentions) = erFixture(s, d)
        editJoin1(catalog, "entity_id", "ename",
            mentions.filter(expr("(mention_id div 4) % 5 <> 4")),
            "mention_id", "mname")
          .write.mode("overwrite").parquet(s"$r/pairs")
        erLabels(catalog, "entity_id", s.read.parquet(s"$r/pairs"))
          .write.mode("overwrite").parquet(s"$r/labels")
      }
      (s"$root/pairs", s"$root/labels")
    }

    /** Full-corpus state for [[qErRetract]]: the link table + labels of
      * ALL mentions (the state a finished [[resolve]] run persists) —
      * retraction starts from a complete yesterday. */
    def ensureAll(s: SparkSession, d: String): (String, String) = {
      val root = FixtureBase.ensure("graft_er_base", 1, d,
          Seq("pairs_all", "labels_all")) { r =>
        val (catalog, mentions) = erFixture(s, d)
        editJoin1(catalog, "entity_id", "ename", mentions,
            "mention_id", "mname")
          .write.mode("overwrite").parquet(s"$r/pairs_all")
        erLabels(catalog, "entity_id", s.read.parquet(s"$r/pairs_all"))
          .write.mode("overwrite").parquet(s"$r/labels_all")
      }
      (s"$root/pairs_all", s"$root/labels_all")
    }
  }

  /** INCREMENTAL entity resolution (r13 — closes the "ER is batch-only"
    * gap): a new mention batch arrives against yesterday's resolved
    * state, and the expensive stage — segment-blocked BLOCK + VERIFY —
    * runs on the NEW BATCH ONLY. Yesterday's connectivity enters by
    * CONTRACTION ([[ConnectedComponents.closeWithNewEdges]], shared with
    * [[DedupClusters.clustersIncrement]]): the new batch's entity
    * projection maps to current components, the closure runs over the
    * O(batch) contracted graph, and only touched components relabel;
    * cross-batch component MERGES (a new ambiguous mention claiming
    * entities from two old components) fall out of the closure exactly.
    * The assignment/size/survivorship tail re-aggregates the full link
    * table — linear, and unavoidable since a merge relabels old
    * mentions too.
    *
    * Increment ≡ recompute is the whole claim, so the oracle IS
    * `q_er_pipeline`'s full-recompute SQL (the cluster_increment
    * discipline — one string, zero drift).
    *
    * 100 TB shape: per-batch cost = blocking O(batch) + two linear label
    * scans (the contraction joins) + CC over the O(batch) contracted
    * graph + the linear tail; the corpus-sized blocking join never
    * re-runs and the closure never touches an entity-sized graph. State
    * on disk is (links, labels) — both bounded by matches, not by
    * mentions × catalog. */
  private def qErIncrement(s: SparkSession, d: String): DataFrame = {
    val (catalog, mentions) = erFixture(s, d)
    val (pairsPath, labelsPath) = ErBase.ensure(s, d)
    resolveIncrement(catalog, "entity_id",
      s.read.parquet(pairsPath), s.read.parquet(labelsPath),
      editJoin1(catalog, "entity_id", "ename",
        mentions.filter(expr("(mention_id div 4) % 5 = 4")),
        "mention_id", "mname"))
  }

  /** Driver binding of [[resolveRetract]]: take down the
    * `(mention_id div 4) % 29 = 3` batch (~3.4% — a realistic takedown
    * rate, orthogonal to the increment's %5 split) from the full-corpus state. The oracle is the
    * full recompute WITH those mentions excluded — retraction ≡
    * recompute-on-the-survivors, the same one-string discipline as the
    * increments. */
  private def qErRetract(s: SparkSession, d: String): DataFrame = {
    val (catalog, mentions) = erFixture(s, d)
    val (pairsPath, labelsPath) = ErBase.ensureAll(s, d)
    resolveRetract(catalog, "entity_id",
      s.read.parquet(pairsPath), s.read.parquet(labelsPath),
      mentions.filter(expr("(mention_id div 4) % 29 = 3"))
        .select(col("mention_id")),
      "mention_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fuzzy_join" -> qFuzzyJoin _,
    "q_er_pipeline" -> qErPipeline _,
    "q_er_increment" -> qErIncrement _,
    "q_er_retract" -> qErRetract _)

  /** `q_er_increment`'s oracle IS the full recompute — increment ≡
    * recompute is the operator's contract (see [[qErIncrement]]). */
  private[graft] def erRecomputeOracle: String = erRecomputeOracle("TRUE")

  /** Parameterized form: `mentionPred` scopes the mention set —
    * `q_er_retract`'s oracle is the recompute over the SURVIVORS. */
  private[graft] def erRecomputeOracle(mentionPred: String): String =
    s"""WITH RECURSIVE ${fuzzyPairsCte("p_partkey % 4 = 0", "p_partkey % 8 = 4", mentionPred)},
       |ee AS (
       |  SELECT DISTINCT a.entity_id AS e1, b.entity_id AS e2
       |  FROM fpairs a JOIN fpairs b USING (mention_id)
       |  WHERE a.entity_id < b.entity_id),
       |edges AS (
       |  SELECT e1 AS a, e2 AS b FROM ee
       |  UNION ALL
       |  SELECT e2 AS a, e1 AS b FROM ee),
       |reach(id, r) AS (
       |  SELECT entity_id, entity_id FROM ent
       |  UNION
       |  SELECT e.b, reach.r FROM reach JOIN edges e ON reach.id = e.a),
       |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
       |mres AS (
       |  SELECT mention_id, min(component) AS component
       |  FROM fpairs JOIN comp ON comp.id = fpairs.entity_id
       |  GROUP BY mention_id),
       |csize AS (SELECT component, count(*) AS cluster_size FROM mres
       |          GROUP BY component),
       |ecnt AS (SELECT entity_id, count(*) AS n FROM fpairs
       |         GROUP BY entity_id),
       |elab AS (SELECT entity_id, component, n
       |         FROM ecnt JOIN comp ON comp.id = ecnt.entity_id),
       |reps AS (
       |  SELECT component, entity_id AS rep_entity FROM (
       |    SELECT component, entity_id,
       |           row_number() OVER (PARTITION BY component
       |                              ORDER BY n DESC, entity_id) AS rn
       |    FROM elab) t WHERE rn = 1)
       |SELECT m.mention_id, m.component, s.cluster_size, r.rep_entity
       |FROM mres m JOIN csize s USING (component)
       |JOIN reps r USING (component)
       |ORDER BY mention_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_er_increment" -> erRecomputeOracle,
    "q_er_retract" -> erRecomputeOracle("NOT ((p_partkey // 4) % 29 = 3)"),
    "q_er_pipeline" ->
      s"""WITH RECURSIVE ${fuzzyPairsCte("p_partkey % 4 = 0", "p_partkey % 8 = 4")},
         |ee AS (
         |  SELECT DISTINCT a.entity_id AS e1, b.entity_id AS e2
         |  FROM fpairs a JOIN fpairs b USING (mention_id)
         |  WHERE a.entity_id < b.entity_id),
         |edges AS (
         |  SELECT e1 AS a, e2 AS b FROM ee
         |  UNION ALL
         |  SELECT e2 AS a, e1 AS b FROM ee),
         |reach(id, r) AS (
         |  SELECT entity_id, entity_id FROM ent
         |  UNION
         |  SELECT e.b, reach.r FROM reach JOIN edges e ON reach.id = e.a),
         |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
         |mres AS (
         |  SELECT mention_id, min(component) AS component
         |  FROM fpairs JOIN comp ON comp.id = fpairs.entity_id
         |  GROUP BY mention_id),
         |csize AS (SELECT component, count(*) AS cluster_size FROM mres
         |          GROUP BY component),
         |ecnt AS (SELECT entity_id, count(*) AS n FROM fpairs
         |         GROUP BY entity_id),
         |elab AS (SELECT entity_id, component, n
         |         FROM ecnt JOIN comp ON comp.id = ecnt.entity_id),
         |reps AS (
         |  SELECT component, entity_id AS rep_entity FROM (
         |    SELECT component, entity_id,
         |           row_number() OVER (PARTITION BY component
         |                              ORDER BY n DESC, entity_id) AS rn
         |    FROM elab) t WHERE rn = 1)
         |SELECT m.mention_id, m.component, s.cluster_size, r.rep_entity
         |FROM mres m JOIN csize s USING (component)
         |JOIN reps r USING (component)
         |ORDER BY mention_id""".stripMargin,
    "q_fuzzy_join" ->
      s"""WITH $fuzzyPairsCte
         |SELECT mention_id, entity_id, dist
         |FROM fpairs
         |ORDER BY mention_id, entity_id""".stripMargin)

  /** Shared CTE chain (no leading WITH) producing
    * `fpairs(mention_id, entity_id, dist)` — the segment-blocked
    * edit-≤-1 pairs of the driver binding. One string for the
    * `q_fuzzy_join` oracle AND the `q_er_pipeline` oracle's blocking
    * stage, so the linkage arithmetic can never drift between them. */
  // a def, not a val: the oracle Map above interpolates this during
  // object init, and a later-declared val would still be null there
  private[operators] def fuzzyPairsCte: String =
    fuzzyPairsCte("TRUE", "p_partkey % 2 = 1")

  /** Parameterized form: `subsetPred` scopes the catalog (TRUE → the
    * full-table stress form of `q_fuzzy_join`; `q_er_pipeline` resolves
    * the quarter-catalog `p_partkey % 4 = 0` slice, whose name-space
    * density matches a realistic catalog — at full density the synthetic
    * part names sit within edit 1 of each other en masse and every
    * mention drags in dozens of entities) and `dirtyPred` picks which
    * mentions get the single-char deletion. */
  private[operators] def fuzzyPairsCte(subsetPred: String,
      dirtyPred: String): String = fuzzyPairsCte(subsetPred, dirtyPred, "TRUE")

  /** Three-predicate form: `mentionPred` additionally scopes which
    * mentions exist at all (the retraction oracle's survivor set). */
  private[operators] def fuzzyPairsCte(subsetPred: String,
      dirtyPred: String, mentionPred: String): String =
    """base AS (SELECT * FROM part WHERE SUBSETPRED),
      |ent AS (
      |  SELECT p_brand || ' ' || p_name || ' ' || p_type AS ename,
      |         min(p_partkey) AS entity_id
      |  FROM base GROUP BY 1),
      |men AS (
      |  SELECT p_partkey AS mention_id,
      |         CASE WHEN DIRTYPRED THEN
      |           substring(n, 1, p_partkey % len(n)) || substring(n, p_partkey % len(n) + 2)
      |         ELSE n END AS mname
      |  FROM (SELECT p_partkey, p_brand || ' ' || p_name || ' ' || p_type AS n FROM base)
      |  WHERE MENTIONPRED),
      |eseg AS (
      |  SELECT entity_id, ename, len(ename) AS l, 1 AS segno,
      |         substring(ename, 1, len(ename) // 2) AS seg FROM ent
      |  UNION ALL
      |  SELECT entity_id, ename, len(ename) AS l, 2 AS segno,
      |         substring(ename, len(ename) // 2 + 1) AS seg FROM ent),
      |mkey AS (
      |  SELECT mention_id, mname, len(mname) + dl AS l, segno,
      |         CASE WHEN segno = 1 THEN substring(mname, 1, (len(mname) + dl) // 2)
      |              ELSE substring(mname, greatest(len(mname) - ((len(mname) + dl) - (len(mname) + dl) // 2) + 1, 1)) END AS seg
      |  FROM men, (SELECT unnest([-1, 0, 1]) AS dl), (SELECT unnest([1, 2]) AS segno)
      |  WHERE len(mname) + dl >= 2),
      |cand AS (
      |  SELECT DISTINCT mention_id, mname, entity_id, ename
      |  FROM mkey JOIN eseg USING (l, segno, seg)),
      |fpairs AS (
      |  SELECT mention_id, entity_id,
      |         cast(levenshtein(mname, ename) AS bigint) AS dist
      |  FROM cand WHERE levenshtein(mname, ename) <= 1)""".stripMargin
      .replace("SUBSETPRED", subsetPred)
      .replace("DIRTYPRED", dirtyPred)
      .replace("MENTIONPRED", mentionPred)
}
