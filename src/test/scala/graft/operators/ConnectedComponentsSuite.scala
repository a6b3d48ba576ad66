package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** [[ConnectedComponents.components]] vs a brute-force union-find oracle.
  *
  * Spark-backed property testing: each case costs several distributed jobs,
  * so instead of ScalaCheck's default 100 generated cases this drives a
  * seeded-random batch of small graphs (deterministic across runs) plus the
  * adversarial shapes that break naive propagation — long chains (need
  * pointer jumping to converge inside maxRounds), isolated nodes, self
  * loops, duplicate and reversed edges, and the maxRounds failure path.
  */
class ConnectedComponentsSuite extends AnyFunSuite {
  private val s = TestSpark.spark
  import s.implicits._

  /** Brute-force oracle: union-find over the edge list. */
  private def ufComponents(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical label = min node id in the component
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) => val m = ns.min; ns.map(_ -> m) }
  }

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)],
                  maxRounds: Int = 50): Map[Long, Long] = {
    val nodesDf = nodes.toDF("nid")
    val edgesDf =
      if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("src", "dst")
      else edges.toDF("src", "dst")
    ConnectedComponents.components(nodesDf, "nid", edgesDf, "src", "dst",
        maxRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("matches union-find on seeded random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 8) {
      val n = 5 + rnd.nextInt(12)
      val nodes = (0L until n.toLong).toSeq
      val nEdges = rnd.nextInt(2 * n)
      val edges = Seq.fill(nEdges)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val want = ufComponents(nodes, edges)
      val got = run(nodes, edges)
      assert(got == want, s"trial $trial: n=$n edges=$edges")
    }
  }

  test("collapses a long chain (pointer jumping) within log-bounded rounds") {
    val nodes = (0L to 20L).toSeq
    val edges = (0L until 20L).map(i => (i, i + 1))
    // 21-node chain: naive propagation needs 20 rounds; pointer jumping
    // must land it within ~log2(21)+slack. maxRounds=8 proves the jump.
    val got = run(nodes, edges, maxRounds = 8)
    assert(got.values.toSet == Set(0L))
  }

  test("isolated nodes label themselves; self-loops and dup edges are inert") {
    val nodes = Seq(3L, 7L, 9L)
    val edges = Seq((3L, 3L), (7L, 9L), (9L, 7L), (7L, 9L))
    assert(run(nodes, edges) == Map(3L -> 3L, 7L -> 7L, 9L -> 7L))
  }

  test("a two-component graph labels each side with its own minimum") {
    val nodes = (0L to 12L).toSeq
    val edges = (0L until 5L).map(i => (i, i + 1)) ++
      (7L until 12L).map(i => (i, i + 1))
    val got = run(nodes, edges)
    assert((0L to 5L).forall(got(_) == 0L))
    assert(got(6L) == 6L)
    assert((7L to 12L).forall(got(_) == 7L))
  }

  test("fails loudly when maxRounds is too small to converge") {
    val nodes = (0L to 20L).toSeq
    val edges = (0L until 20L).map(i => (i, i + 1))
    assertThrows[IllegalStateException](run(nodes, edges, maxRounds = 1))
  }

  test("with a checkpoint dir set, rounds use reliable checkpoints and converge") {
    // the executor-loss-safe mode for long 100 TB runs (see scaladoc):
    // a session checkpoint dir switches the per-round localCheckpoint to
    // df.checkpoint() against that directory
    val sc = s.sparkContext
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt").toFile
    try {
      sc.setCheckpointDir(dir.getAbsolutePath)
      val got = run((0L to 8L).toSeq, (0L until 8L).map(i => (i, i + 1)))
      assert((0L to 8L).forall(got(_) == 0L))
      // the reliable path really wrote round state under the dir, and the
      // per-round cleanup left only the FINAL round's rdd files (a leak
      // here means a 50-round 100 TB run keeps 50 label-table copies)
      def rddDirs(f: java.io.File): Seq[java.io.File] =
        Option(f.listFiles).toSeq.flatten.flatMap { c =>
          if (c.isDirectory && c.getName.startsWith("rdd-")) Seq(c)
          else if (c.isDirectory) rddDirs(c) else Nil
        }
      val left = rddDirs(dir)
      assert(left.nonEmpty, "no checkpoint data written to the checkpoint dir")
      assert(left.size <= 2, s"leaked round checkpoints: ${left.map(_.getName)}")
    } finally {
      sc.setCheckpointDir(null)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir)
    }
  }

  test("clustersIncrement by contraction over old labels equals the " +
      "full recompute, including a batch doc bridging two old clusters") {
    // old corpus: clusters {1,2} and {3,4}; batch docs 5, 6.
    // new pairs: (2,5) and (5,4) — 5 BRIDGES the two old clusters;
    // 6 arrives with no pairs and must stay a singleton.
    val nodes = (1L to 6L).toDF("id")
    val oldLabels = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L))
      .toDF("id", "component")
    val newPairs = Seq((2L, 5L), (5L, 4L)).toDF("a", "b")
    val inc = DedupClusters
      .clustersIncrement(nodes, "id", oldLabels, newPairs, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toList.sortBy(_._1)
    // full recompute over the ORIGINAL pair set + the new pairs
    val allPairs = Seq((1L, 2L), (3L, 4L), (2L, 5L), (5L, 4L)).toDF("a", "b")
    val full = DedupClusters
      .clustersFromPairs(nodes, "id", allPairs, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toList.sortBy(_._1)
    assert(inc == full, s"inc=$inc full=$full")
    val comp = inc.map(t => t._1 -> t._2).toMap
    assert((1L to 5L).forall(comp(_) == 1L), comp)   // merged under min id
    assert(comp(6L) == 6L && inc.find(_._1 == 6L).get._4) // singleton keeps
  }

  test("clustersRetract: deleting a bridge doc splits the cluster; " +
      "deleting a leaf doc leaves the rest merged") {
    // cluster {1,2,3} held together through 2: pairs (1,2), (2,3);
    // separate cluster {4,5}; deleting 2 must split {1},{3}.
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L))
      .toDF("doc_id", "component")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    def retract(ids: Long*) = DedupClusters
      .clustersRetract(labels, "doc_id", pairs, "doc_a", "doc_b",
        ids.toDF("doc_id"), "doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toList.sortBy(_._1)
    assert(retract(2L) == List((1L, 1L, 1L, true), (3L, 3L, 1L, true),
      (4L, 4L, 2L, true), (5L, 4L, 2L, false)))
    // deleting leaf 1: {2,3} stay merged under new min id 2
    assert(retract(1L) == List((2L, 2L, 2L, true), (3L, 2L, 2L, false),
      (4L, 4L, 2L, true), (5L, 4L, 2L, false)))
    // deleting from the OTHER cluster leaves {1,2,3} labels untouched
    assert(retract(5L) == List((1L, 1L, 3L, true), (2L, 1L, 3L, false),
      (3L, 1L, 3L, false), (4L, 4L, 1L, true)))
  }

  test("PROPERTY: closeWithNewEdges ≡ full closure on seeded random graphs") {
    // The shared incremental engine: converge labels on OLD edges, then
    // contraction-close the NEW edges — must equal one full closure over
    // old ∪ new. Seeded random graphs, deterministic across runs.
    val rnd = new scala.util.Random(1013L)
    for (trial <- 1 to 6) {
      val n = 8 + rnd.nextInt(25)
      val nodes = (1L to n.toLong)
      def edges(m: Int) = Seq.fill(m)(
        (1L + rnd.nextInt(n), 1L + rnd.nextInt(n))).filter(p => p._1 != p._2)
      val old = edges(rnd.nextInt(n))
      val fresh = edges(1 + rnd.nextInt(n / 2))
      val oldLabels = ufComponents(nodes, old).toSeq.toDF("id", "comp")
      val got = ConnectedComponents.closeWithNewEdges(oldLabels,
          fresh.toDF("e1", "e2"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = ufComponents(nodes, old ++ fresh)
      assert(got == want, s"trial $trial: n=$n old=$old fresh=$fresh")
    }
  }

  test("PROPERTY: clustersRetract ≡ recompute-on-survivors on seeded " +
      "random graphs") {
    val rnd = new scala.util.Random(2027L)
    for (trial <- 1 to 6) {
      val n = 8 + rnd.nextInt(25)
      val nodes = (1L to n.toLong)
      val pairs = Seq.fill(2 * n)(
        (1L + rnd.nextInt(n), 1L + rnd.nextInt(n))).filter(p => p._1 != p._2)
      val deleted = nodes.filter(_ => rnd.nextInt(5) == 0)
      val labels = ufComponents(nodes, pairs).toSeq.toDF("doc_id", "component")
      val got = DedupClusters.clustersRetract(labels, "doc_id",
          pairs.toDF("doc_a", "doc_b"), "doc_a", "doc_b",
          deleted.toDF("doc_id"), "doc_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val survivors = nodes.filterNot(deleted.contains)
      val keptPairs = pairs.filter(p =>
        !deleted.contains(p._1) && !deleted.contains(p._2))
      val want = ufComponents(survivors, keptPairs)
      assert(got == want, s"trial $trial: n=$n deleted=$deleted")
    }
  }

  test("clustersIncrement with no new pairs reproduces the old labels " +
      "extended by the batch singletons") {
    val nodes = (1L to 5L).toDF("id")
    val oldLabels = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("id", "component")
    val none = Seq.empty[(Long, Long)].toDF("a", "b")
    val got = DedupClusters
      .clustersIncrement(nodes, "id", oldLabels, none, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 5L), got)
  }

}
