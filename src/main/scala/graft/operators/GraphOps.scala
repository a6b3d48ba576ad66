package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Iterative graph analytics over bounded edge lists — PageRank beside
  * [[ConnectedComponents]]' min-label propagation. In a training-data
  * pipeline the node scores rank corpus regions by how central they are in
  * the semantic-similarity graph (data-selection weighting, cluster-seed
  * picking, boilerplate hubs showing up as high-rank outliers), the same
  * way the reference ranks nothing but *bounds* everything: iterate a
  * fixed number of rounds over bounded state instead of materializing the
  * transitive structure (the ec:2104-2194 resume-from-bounded-bookkeeping
  * principle, applied to graphs).
  *
  * Engine-exact arithmetic (the repo-wide hash-parity discipline): ranks
  * live in integer micro-units. Each round is
  * `r'(v) = 150000 + Σ_{(u→v)} (r(u) * 85) div (100 * outdeg(u))` — the
  * damping 0.85 expressed as exact long multiply + integer division
  * (truncating; all operands positive, so Spark's `div` and DuckDB's `//`
  * agree bit-for-bit), and the per-node sum is long addition, which is
  * associative — partitioning can never move the result the way double
  * summation order would. Nodes without out-edges simply leak their mass
  * (the standard simplified-PageRank dangling policy), identically in
  * both engines.
  *
  * Scale shape: each round is ONE equi-join of the degree-annotated edge
  * list against the current ranks (both keyed by node id) plus ONE hash
  * aggregation keyed by the destination — the canonical distributed
  * PageRank plan. The edge list is degree-annotated and materialized ONCE
  * ([[Materialize]]: reliable checkpoint when a checkpoint dir is set);
  * every round references it, so without the cut the upstream edge
  * computation (here a bucketed KNN self-join) would re-run per round.
  * Rounds chain linearly (each rank frame references the previous one
  * exactly once), so the DAG stays linear in `iters` — no per-round
  * checkpoint needed, unlike the CC loop whose round plans reference the
  * previous labels four times.
  */
object GraphOps {

  /** Fixed-round integer-exact PageRank. `nodes` is one row per node id;
    * `edges` one row per directed edge. Returns (id, rank_micro). */
  private[graft] def pageRank(nodes: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val n = nodes.select(col(idCol).as("id"))
    val deg = edges.groupBy(col(srcCol).as("src"))
      .agg(count(lit(1)).as("deg"))
    // Degree-annotated edges, materialized once — every round joins it.
    val ed = Materialize(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
        .join(deg, "src"))
    var ranks = n.select(col("id"), lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      val contribs = ed.join(ranks, ed("src") === ranks("id"))
        .select(col("dst"), expr("(r * 85L) div (100L * deg)").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = n.join(contribs, n("id") === contribs("dst"), "left")
        .select(n("id"), (lit(150000L) + coalesce(col("s"), lit(0L))).as("r"))
    }
    ranks.select(col("id"), col("r").as("rank_micro"))
  }

  /** PageRank over the bucketed KNN semantic-similarity graph
    * ([[LlmQueries.knnGraphBucketed]] top-3 edges): the 50 most central
    * vectors after 3 rounds. The IVF assignment materializes once and
    * feeds both the KNN self-join sides and the node list. */
  private def qGraphPagerank(s: SparkSession, d: String): DataFrame = {
    val assigned = Materialize(LlmQueries.ivfAssigned(s, d))
    val edges = LlmQueries.knnGraphBucketed(assigned, k = 3)
      .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
    val nodes = assigned.select(col("vec_id"))
    pageRank(nodes, "vec_id", edges, "src", "dst", iters = 3)
      .select(col("id").as("vec_id"), col("rank_micro"))
      .orderBy(col("rank_micro").desc, col("vec_id"))
      .limit(50)
  }

  /** Exact per-node triangle counts via RANK-ORIENTED wedge closure — the
    * clustering-coefficient numerator, and the standard way to count
    * triangles without enumerating each one 6 times or letting a hub
    * explode the wedge set. Every undirected edge is oriented from the
    * (degree, id)-lexicographically SMALLER endpoint to the larger; for a
    * triangle with rank order p < q < r the only wedge is (q, r) centered
    * at p and the only closing edge is q→r — each triangle materializes
    * exactly once. The wedge fan-out per node is then out-degree², and
    * out-degree is bounded by ~√(2|E|) under rank orientation no matter
    * how skewed the raw degree distribution is — the hub that would
    * generate deg² wedges under naive enumeration generates almost none,
    * because nearly all its edges point INTO it.
    *
    * Scale shape: two equi-joins (wedge build on the center, closure on
    * the (x, y) pair) + one explode-3 hash agg for the per-node counts.
    * Everything is long ids; no payload rides any shuffle. */
  private[graft] def triangleCounts(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = und.select(col("a").as("v"))
      .unionAll(und.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val or = und
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("w"), col("db").as("dw")))
          .otherwise(
            struct(col("b").as("u"), col("a").as("w"), col("da").as("dw")))
          .as("e"))
      .select(col("e.u").as("u"), col("e.w").as("w"), col("e.dw").as("dw"))
    val ed = Materialize(or)
    val wedges = ed.select(col("u"), col("w").as("x"), col("dw").as("dx"))
      .join(ed.select(col("u"), col("w").as("y"), col("dw").as("dy")), "u")
      .filter(col("dx") < col("dy") ||
        (col("dx") === col("dy") && col("x") < col("y")))
    val tris = wedges.join(
      ed.select(col("w").as("y"), col("u").as("x")), Seq("x", "y"))
    tris.select(explode(array(col("u"), col("x"), col("y"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_tri"))
  }

  /** Triangle participation over the same KNN top-3 edge graph PageRank
    * ranks — dense-neighborhood detection (a vector in many triangles
    * sits in a tight semantic cluster; boilerplate and template families
    * show up as triangle-heavy cliques). Top-20 nodes. */
  private def qGraphTriangles(s: SparkSession, d: String): DataFrame = {
    val assigned = Materialize(LlmQueries.ivfAssigned(s, d))
    val edges = LlmQueries.knnGraphBucketed(assigned, k = 3)
      .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
    triangleCounts(edges, "src", "dst")
      .select(col("id").as("vec_id"), col("n_tri"))
      .orderBy(col("n_tri").desc, col("vec_id"))
      .limit(20)
  }

  /** Synchronous majority-vote LABEL PROPAGATION — semi-supervised
    * auto-labeling: a seed fraction keeps its known label, and each round
    * every node adopts the most common label among its in-neighbors
    * (ties → smallest label; seeds never change; a node with no labeled
    * neighbor keeps what it had). The training-data use is bootstrapping
    * labels across the semantic-similarity graph from a small
    * hand-labeled set — the graph twin of [[LlmQueries.hardNegatives]]'
    * label-aware mining.
    *
    * Determinism: votes are exact long counts; the argmax is a
    * row_number over (count DESC, label ASC) — a total order, so the
    * adopted label is partitioning-independent, and rounds are
    * synchronous (all nodes flip on the previous round's labels), unlike
    * the classic async LPA whose result is schedule-dependent.
    *
    * Scale shape: per round ONE edge⋈labels equi-join + ONE (dst, label)
    * hash agg + a per-node argmax window (state bounded by |distinct
    * labels| per node) + a left join back — all keyed exchanges, no
    * payload. Each round references the previous labels twice (votes +
    * keep-fallback), so labels materialize per round ([[Materialize]],
    * the CC pattern) to keep the DAG linear. */
  private[graft] def labelPropagate(nodes: DataFrame, idCol: String,
      seedCol: String, edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val es = Materialize(edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionAll(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct())
    var labs = nodes.select(col(idCol).as("id"),
      col(seedCol).as("seed_lab"), col(seedCol).as("lab"))
    for (_ <- 1 to iters) {
      val votes = es
        .join(labs.select(col("id").as("_sid"), col("lab").as("_slab"))
          .filter(col("_slab").isNotNull), col("src") === col("_sid"))
        .groupBy(col("dst"), col("_slab")).agg(count(lit(1)).as("n"))
      val best = votes
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("dst"))
            .orderBy(col("n").desc, col("_slab").asc)))
        .filter(col("rn") === 1)
        .select(col("dst"), col("_slab").as("new_lab"))
      labs = Materialize(labs
        .join(best, labs("id") === best("dst"), "left")
        .select(col("id"), col("seed_lab"),
          coalesce(col("seed_lab"), col("new_lab"), col("lab")).as("lab")))
    }
    labs.select(col("id"), col("seed_lab"), col("lab"))
  }

  /** 3 rounds of label propagation from a 20% deterministic seed
    * (`vec_id % 5 = 0` keeps its true label) over the symmetrized KNN
    * top-3 graph, reported as the NON-SEED confusion matrix — how well
    * the similarity graph recovers the held-out labels. */
  private def qGraphLabelprop(s: SparkSession, d: String): DataFrame = {
    val assigned = Materialize(LlmQueries.ivfAssigned(s, d))
    val edges = LlmQueries.knnGraphBucketed(assigned, k = 3)
      .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
    val nodes = assigned.select(col("vec_id").as("id"),
      col("label").as("true_lab"),
      when(col("vec_id") % 5 === 0, col("label")).as("seed"))
    labelPropagate(nodes, "id", "seed", edges, "src", "dst", iters = 3)
      .join(nodes.select(col("id"), col("true_lab")), "id")
      .filter(col("seed_lab").isNull)
      .groupBy(col("true_lab").as("true_label"),
        col("lab").as("predicted_label"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("true_label"), col("predicted_label"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_graph_pagerank" -> (qGraphPagerank _),
    "q_graph_triangles" -> (qGraphTriangles _),
    "q_graph_labelprop" -> (qGraphLabelprop _)
  )

  /** Shares [[LlmQueries.knnGraphCte]] verbatim with the `q_knn_join`
    * oracle, so the edge graph the two queries rank can never drift. */
  val oracle: Map[String, String] = Map(
    "q_graph_pagerank" -> {
      val rounds = (1 to 3).map { i =>
        s"""c$i AS (SELECT ed.dst AS id,
           |          CAST(sum((r${i - 1}.r * 85) // (100 * ed.deg)) AS bigint) AS s
           |       FROM ed JOIN r${i - 1} ON ed.src = r${i - 1}.id GROUP BY ed.dst),
           |r$i AS (SELECT n.id, 150000 + coalesce(c$i.s, 0) AS r
           |       FROM nodes n LEFT JOIN c$i USING (id))""".stripMargin
      }.mkString(",\n")
      s"""WITH ${LlmQueries.knnGraphCte},
         |edges AS (SELECT vec_id AS src, nbr_id AS dst FROM knnq),
         |nodes AS (SELECT vec_id AS id FROM e),
         |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         |ed AS (SELECT edges.src, edges.dst, deg.deg
         |       FROM edges JOIN deg USING (src)),
         |r0 AS (SELECT id, CAST(1000000 AS bigint) AS r FROM nodes),
         |$rounds
         |SELECT id AS vec_id, r AS rank_micro FROM r3
         |ORDER BY rank_micro DESC, vec_id LIMIT 50""".stripMargin
    },
    // Triangles: the same rank orientation spelled in SQL — und/deg/or/
    // wedges/closure, each triangle once, exploded to its 3 corners.
    "q_graph_triangles" ->
      s"""WITH ${LlmQueries.knnGraphCte},
         |und AS (SELECT DISTINCT least(vec_id, nbr_id) AS a,
         |               greatest(vec_id, nbr_id) AS b
         |        FROM knnq WHERE vec_id <> nbr_id),
         |deg AS (SELECT v, count(*) AS deg FROM (
         |          SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und)
         |        GROUP BY v),
         |orient AS (
         |  SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b)
         |              THEN a ELSE b END AS u,
         |         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b)
         |              THEN b ELSE a END AS w,
         |         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b)
         |              THEN db.deg ELSE da.deg END AS dw
         |  FROM und JOIN deg da ON und.a = da.v JOIN deg db ON und.b = db.v),
         |wedges AS (
         |  SELECT e1.u, e1.w AS x, e1.dw AS dx, e2.w AS y, e2.dw AS dy
         |  FROM orient e1 JOIN orient e2 ON e1.u = e2.u
         |  WHERE e1.dw < e2.dw OR (e1.dw = e2.dw AND e1.w < e2.w)),
         |tris AS (
         |  SELECT wedges.u, wedges.x, wedges.y
         |  FROM wedges JOIN orient ON orient.u = wedges.x AND orient.w = wedges.y),
         |corners AS (SELECT unnest([u, x, y]) AS id FROM tris)
         |SELECT id AS vec_id, count(*) AS n_tri
         |FROM corners GROUP BY id
         |ORDER BY n_tri DESC, vec_id LIMIT 20""".stripMargin,
    // Label propagation: the same synchronous rounds unrolled — votes,
    // (count DESC, label ASC) argmax, coalesce(seed, new, old).
    "q_graph_labelprop" -> {
      val rounds = (1 to 3).map { i =>
        s"""v$i AS (SELECT ed0.dst, l${i - 1}.lab AS slab, count(*) AS n
           |       FROM ed0 JOIN l${i - 1} ON ed0.src = l${i - 1}.id
           |       WHERE l${i - 1}.lab IS NOT NULL GROUP BY 1, 2),
           |b$i AS (SELECT dst, slab FROM (
           |         SELECT dst, slab, row_number() OVER (
           |           PARTITION BY dst ORDER BY n DESC, slab ASC) AS rn
           |         FROM v$i) WHERE rn = 1),
           |l$i AS (SELECT l.id, l.seed_lab,
           |               coalesce(l.seed_lab, b$i.slab, l.lab) AS lab
           |       FROM l${i - 1} l LEFT JOIN b$i ON l.id = b$i.dst)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${LlmQueries.knnGraphCte},
         |ed0 AS (SELECT vec_id AS src, nbr_id AS dst FROM knnq
         |        UNION SELECT nbr_id AS src, vec_id AS dst FROM knnq),
         |nodes AS (SELECT vec_id AS id, label AS true_lab,
         |                 CASE WHEN vec_id % 5 = 0 THEN label END AS seed_lab
         |          FROM embeddings),
         |l0 AS (SELECT id, seed_lab, seed_lab AS lab FROM nodes),
         |$rounds
         |SELECT nd.true_lab AS true_label, l3.lab AS predicted_label,
         |       cast(count(*) AS bigint) AS n
         |FROM l3 JOIN nodes nd USING (id)
         |WHERE l3.seed_lab IS NULL
         |GROUP BY 1, 2
         |ORDER BY true_label, predicted_label NULLS FIRST""".stripMargin
    }
  )
}
