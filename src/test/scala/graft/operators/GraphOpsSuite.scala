package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** [[GraphOps.pageRank]] vs a driver-side reference implementation of the
  * same integer-exact recurrence, plus the shapes the distributed plan has
  * to survive: dangling nodes (mass leaks), sinks with no out-edges,
  * isolated nodes (stay at the base rank), multi-edges (each contributes),
  * and determinism under repartitioning (long addition is associative, so
  * partitioning must not move a single micro-unit).
  */
class GraphOpsSuite extends AnyFunSuite {
  private val s = TestSpark.spark
  import s.implicits._

  /** Reference: the identical recurrence, computed sequentially. */
  private def refRanks(nodes: Seq[Long], edges: Seq[(Long, Long)],
                       iters: Int): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).map { case (k, es) => k -> es.size.toLong }
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => (r(u) * 85L) / (100L * deg(u)) }.sum
      }
      r = nodes.map(n => n -> (150000L + in.getOrElse(n, 0L))).toMap
    }
    r
  }

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)],
                  iters: Int): Map[Long, Long] = {
    val nodesDf = nodes.toDF("nid")
    val edgesDf =
      if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("src", "dst")
      else edges.toDF("src", "dst")
    GraphOps.pageRank(nodesDf, "nid", edgesDf, "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("matches the sequential recurrence on seeded random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 6) {
      val n = 4 + rnd.nextInt(10)
      val nodes = (0L until n.toLong).toSeq
      val edges = Seq.fill(rnd.nextInt(3 * n))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val want = refRanks(nodes, edges, iters = 3)
      val got = run(nodes, edges, iters = 3)
      assert(got == want, s"trial $trial: n=$n edges=$edges")
    }
  }

  test("isolated nodes hold the base rank; sinks accumulate; dangling mass leaks") {
    // 0 -> 1 -> 2 (sink), 3 isolated. Node 2 has no out-edges: its mass
    // leaks (dangling policy), it only receives.
    val nodes = Seq(0L, 1L, 2L, 3L)
    val edges = Seq((0L, 1L), (1L, 2L))
    val got = run(nodes, edges, iters = 2)
    assert(got == refRanks(nodes, edges, iters = 2))
    assert(got(3L) == 150000L)            // isolated: base only after round 1+
    assert(got(2L) > got(0L))             // sink receives, source only leaks
  }

  test("multi-edges each contribute and split out-degree") {
    val nodes = Seq(0L, 1L, 2L)
    val edges = Seq((0L, 1L), (0L, 1L), (0L, 2L)) // deg(0)=3, two arrive at 1
    assert(run(nodes, edges, iters = 1) == refRanks(nodes, edges, iters = 1))
  }

  test("rank is partitioning-independent (integer sums)") {
    val nodes = (0L until 40L).toSeq
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(120)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val base = run(nodes, edges, iters = 3)
    val skewed = GraphOps.pageRank(
        nodes.toDF("nid").repartition(13),
        "nid",
        edges.toDF("src", "dst").repartition(7),
        "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(skewed == base)
  }

  test("triangleCounts: exact on hand-built graphs — K4, star, " +
      "duplicate/reversed edges, hub + pendant") {
    // K4: 4 triangles, every node in exactly 3.
    val k4 = (for { a <- 0L to 3L; b <- 0L to 3L if a < b } yield (a, b))
    val gotK4 = GraphOps.triangleCounts(k4.toDF("s", "t"), "s", "t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotK4 == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    // A star has no triangles at all — and the hub generates ~no wedges
    // under rank orientation (all its edges point INTO it).
    val star = (1L to 10L).map(i => (0L, i))
    assert(GraphOps.triangleCounts(star.toDF("s", "t"), "s", "t").count() == 0)
    // Duplicate and reversed edges collapse: one triangle, counted once.
    val dup = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L), (2L, 3L))
    val gotDup = GraphOps.triangleCounts(dup.toDF("s", "t"), "s", "t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotDup == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // Triangle + pendant edge: pendant node 4 absent from the output.
    val pend = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val gotPend = GraphOps.triangleCounts(pend.toDF("s", "t"), "s", "t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotPend == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  /** Sequential reference for [[GraphOps.labelPropagate]]: symmetrize +
    * dedup edges, then synchronous rounds of majority vote among labeled
    * neighbors (tie → smallest label), seeds immutable, unlabeled-neighbor
    * nodes keep their current label. */
  private def refLabels(nodes: Seq[(Long, Option[Long])],
                        edges: Seq[(Long, Long)],
                        iters: Int): Map[Long, Option[Long]] = {
    val es = (edges ++ edges.map(_.swap)).distinct
    val seed = nodes.toMap
    var lab = seed
    for (_ <- 1 to iters) {
      val votes = es.flatMap { case (u, v) => lab(u).map(l => (v, l)) }
        .groupBy(identity).map { case ((v, l), hits) => (v, l, hits.size) }
      val best = votes.groupBy(_._1).map { case (v, vs) =>
        v -> vs.minBy { case (_, l, n) => (-n, l) }._2
      }
      lab = nodes.map { case (id, s) =>
        id -> s.orElse(best.get(id)).orElse(lab(id))
      }.toMap
    }
    lab
  }

  private def runLp(nodes: Seq[(Long, Option[Long])],
                    edges: Seq[(Long, Long)],
                    iters: Int): Map[Long, Option[Long]] = {
    val nodesDf = nodes.map { case (id, s) =>
      (id, s.map(Long.box).orNull.asInstanceOf[java.lang.Long])
    }.toDF("id", "seed")
    val edgesDf =
      if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("src", "dst")
      else edges.toDF("src", "dst")
    GraphOps.labelPropagate(nodesDf, "id", "seed", edgesDf, "src", "dst", iters)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
  }

  test("labelPropagate matches the sequential recurrence on seeded random graphs") {
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 6) {
      val n = 5 + rnd.nextInt(12)
      val nodes = (0L until n.toLong).map(i =>
        (i, if (rnd.nextInt(4) == 0) Some(rnd.nextInt(3).toLong) else None))
      val edges = Seq.fill(rnd.nextInt(3 * n))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val want = refLabels(nodes, edges, iters = 3)
      val got = runLp(nodes, edges, iters = 3)
      assert(got == want, s"trial $trial: nodes=$nodes edges=$edges")
    }
  }

  test("labelPropagate: seeds immutable, ties pick smallest, isolated stay null") {
    // 0 seeded A(=1), 1 seeded B(=2); node 2 adjacent to both → tie → 1.
    // Node 3 isolated → stays unlabeled. Node 4 chained off 2 → gets 2's
    // round-1 label in round 2 (synchronous).
    val nodes = Seq(0L -> Some(1L), 1L -> Some(2L), 2L -> None,
                    3L -> None, 4L -> None)
    val edges = Seq((0L, 2L), (1L, 2L), (2L, 4L))
    val got = runLp(nodes, edges, iters = 2)
    assert(got == refLabels(nodes, edges, iters = 2))
    assert(got(0L) == Some(1L) && got(1L) == Some(2L)) // seeds unchanged
    assert(got(2L) == Some(1L))                        // tie → smallest
    assert(got(3L) == None)                            // isolated
    assert(got(4L) == Some(1L))                        // propagated round 2
  }

  test("labelPropagate is partitioning-independent") {
    val rnd = new scala.util.Random(31)
    val nodes = (0L until 30L).map(i =>
      (i, if (i % 6 == 0) Some((i % 3) + 1) else None))
    val edges = Seq.fill(80)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    val base = runLp(nodes, edges, iters = 3)
    val nodesDf = nodes.map { case (id, s) =>
      (id, s.map(Long.box).orNull.asInstanceOf[java.lang.Long])
    }.toDF("id", "seed").repartition(11)
    val skewed = GraphOps.labelPropagate(nodesDf, "id", "seed",
        edges.toDF("src", "dst").repartition(5), "src", "dst", iters = 3)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(skewed == base)
  }

  test("q_graph_pagerank: top-50, all ranks >= base, deterministic across runs") {
    val d = "/root/testdata/sf0.001"
    val r1 = GraphOps.queries("q_graph_pagerank")(s, d).collect()
    val r2 = GraphOps.queries("q_graph_pagerank")(s, d).collect()
    assert(r1.length == 50)
    assert(r1.map(_.getLong(1)).forall(_ >= 150000L))
    assert(r1.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      r2.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    // Descending by rank with vec_id tiebreak — a real (total) order.
    val pairs = r1.map(r => (r.getLong(1), r.getLong(0)))
    assert(pairs.sliding(2).forall { case Array((ra, ia), (rb, ib)) =>
      ra > rb || (ra == rb && ia < ib) })
  }
}
