package graft.streaming

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Streaming EMBEDDING-cluster-label maintenance: stream ≡ the
  * q_emb_clusters recompute, connectivity flows THROUGH a rejected-style
  * near-duplicate (the index-ALL policy), replay is a no-op, converged
  * labels are batch-ORDER-independent under the index's fixed planes,
  * and maintenance requires a created index (planes are index identity,
  * never bootstrapped from an arbitrary batch). */
class EmbClusterStreamSuite extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq

  test("streamed labels equal the full-corpus q_emb_clusters recompute") {
    val s = TestSpark.spark
    assert(rows(SparkEntry.queries("s_emb_cluster_labels")(s, sf)) ==
      rows(SparkEntry.queries("q_emb_clusters")(s, sf)))
  }

  // Angular chain at threshold 0.8: A=0°, B=30°, C=60° in the xy plane —
  // cos(A,B)=cos(B,C)=0.866 ≥ 0.8 but cos(A,C)=0.5 < 0.8. One plane at
  // 45° puts A, B, C in the same sketch bucket (all positive side); D
  // points away (negative side, its own bucket).
  private val vA = Array(1f, 0f)
  private val vB = Array(0.866f, 0.5f)
  private val vC = Array(0.5f, 0.866f)
  private val vD = Array(-1f, -0.5f)
  private val plane = Array(0.707f, 0.707f)
  private val Threshold = 0.8

  private def fixture(tag: String): (String, String, String) = {
    val s = TestSpark.spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory(tag).toString
    val (idx, prs, lbl) = (s"$root/i", s"$root/p", s"$root/l")
    EmbClusterStream.createIndex(Seq((0L, plane)).toDF("id", "v"),
      "id", "v", idx, nPlanes = 1)
    (idx, prs, lbl)
  }

  private def step(vecs: Seq[(Long, Array[Float])], id: Long,
      idx: String, prs: String, lbl: String): Unit = {
    val s = TestSpark.spark
    import s.implicits._
    EmbClusterStream.processBatch(vecs.toDF("vec_id", "embedding"), id,
      "vec_id", "embedding", idx, prs, lbl, Threshold)
  }

  private def labelMap(lbl: String): Map[Long, Long] =
    EmbClusterStream.clusterLabels(TestSpark.spark, lbl)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a chain THROUGH a near-duplicate merges across batches — the " +
      "index-ALL policy (the duplicate's sketch row must stay probeable)") {
    val s = TestSpark.spark
    val (idx, prs, lbl) = fixture("emb_chain")
    step(Seq((1L, vA), (50L, vD)), 0L, idx, prs, lbl)
    step(Seq((2L, vB)), 1L, idx, prs, lbl) // B ~ A → B is the rejected-
    step(Seq((3L, vC)), 2L, idx, prs, lbl) // style dup; C pairs with B only
    val labels = labelMap(lbl)
    assert(labels(1L) == 1L && labels(2L) == 1L && labels(3L) == 1L,
      s"chain through the near-dup did not merge: $labels")
    assert(labels(50L) == 50L)
    // the pair log shows the chain, not a direct (1,3) pair — the merge
    // really did flow through vector 2
    val pairs = s.read.parquet(prs).select("vec_a", "vec_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs((1L, 2L)) && pairs((2L, 3L)) && !pairs((1L, 3L)), pairs)
  }

  test("replaying a micro-batch is a no-op, including across a " +
      "compaction; maintenance continues over the folded state") {
    val s = TestSpark.spark
    val (idx, prs, lbl) = fixture("emb_replay")
    step(Seq((1L, vA), (50L, vD)), 0L, idx, prs, lbl)
    val batch1 = Seq((2L, vB))
    step(batch1, 1L, idx, prs, lbl)
    def state() = (
      labelMap(lbl),
      s.read.parquet(prs).drop("batch").collect()
        .map(_.toString).sorted.toSeq,
      s.read.parquet(idx).drop("batch", "sb")
        .select("vec_id", "sketch").collect()
        .map(_.toString).sorted.toSeq)
    val before = state()
    step(batch1, 1L, idx, prs, lbl) // crash-replay: same data, same id
    assert(state() == before)
    val folded = EmbClusterStream.compactState(s, lbl)
    assert(folded == 1, s"expected delta partial 0 folded, got $folded")
    assert(labelMap(lbl) == before._1)
    step(batch1, 1L, idx, prs, lbl) // replay ACROSS the compaction
    assert(state() == before)
    step(Seq((3L, vC)), 2L, idx, prs, lbl)
    assert(labelMap(lbl) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 50L -> 50L))
  }

  test("converged labels are batch-ORDER-independent under the index's " +
      "fixed planes (the reason planes never bootstrap from a batch)") {
    val all = Seq(1L -> vA, 2L -> vB, 3L -> vC, 50L -> vD)
    val (iF, pF, lF) = fixture("emb_order_fwd")
    all.zipWithIndex.foreach { case ((id, v), b) =>
      step(Seq((id, v)), b.toLong, iF, pF, lF) }
    val (iR, pR, lR) = fixture("emb_order_rev")
    all.reverse.zipWithIndex.foreach { case ((id, v), b) =>
      step(Seq((id, v)), b.toLong, iR, pR, lR) }
    assert(labelMap(lF) == labelMap(lR))
    assert(labelMap(lF) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 50L -> 50L))
  }

  test("plan pin: the probe's index read prunes to the batch's sb " +
      "prefixes (PartitionFilters reach the scan)") {
    val s = TestSpark.spark
    val (idx, prs, lbl) = fixture("emb_prune")
    step(Seq((1L, vA), (50L, vD)), 0L, idx, prs, lbl)
    step(Seq((2L, vB)), 1L, idx, prs, lbl)
    // vB's sketch is 1 (positive side of the 45° plane) → sb bucket 1;
    // the probe read for a batch like it must prune to that bucket.
    val probe = EmbDedupStream.probeRead(s, idx, Seq(1), excludeBatch = 2L)
    val p = probe.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*sb#[^\\]]*\\]".r.findFirstIn(p).isDefined,
      p.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
    assert(probe.select("vec_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L)) // bucket 1 holds A and B; D sits in bucket 0, unread
  }

  test("maintenance refuses an uncreated index instead of silently " +
      "fixing planes from whichever batch arrived first") {
    val s = TestSpark.spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("emb_noidx").toString
    val e = intercept[IllegalArgumentException] {
      EmbClusterStream.processBatch(
        Seq((1L, vA)).toDF("vec_id", "embedding"), 0L,
        "vec_id", "embedding", s"$root/i", s"$root/p", s"$root/l", Threshold)
    }
    assert(e.getMessage.contains("create the index first"))
  }
}
