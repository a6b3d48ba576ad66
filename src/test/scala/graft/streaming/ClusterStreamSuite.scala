package graft.streaming

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming cluster-label maintenance: stream ≡ the q_dup_clusters
  * recompute, connectivity flows THROUGH duplicate docs (the index-ALL
  * policy difference vs [[DedupStream]]), and a replayed micro-batch is
  * a no-op. */
class ClusterStreamSuite extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq

  test("streamed labels equal the full-corpus q_dup_clusters recompute") {
    val s = TestSpark.spark
    assert(rows(SparkEntry.queries("s_cluster_labels")(s, sf)) ==
      rows(SparkEntry.queries("q_dup_clusters")(s, sf)))
  }

  test("a chain THROUGH a duplicate merges across batches — the " +
      "index-ALL policy that distinguishes labels from curation") {
    val s = TestSpark.spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("cluster_chain").toString
    def step(docs: Seq[(Long, String)], id: Long): Unit =
      ClusterStream.processBatch(docs.toDF("doc_id", "text"), id,
        "doc_id", "text", s"$root/i", s"$root/p", s"$root/l", 0.5)
    // A ~ B (B is the rejected-style later near-dup), B ~ C by a chain
    // of single-token mutations, but A and C differ in two tokens and
    // do NOT pair directly at 0.5 under 3-gram shingles.
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    def mut(at: Int*) = (1 to 40)
      .map(i => if (at.contains(i)) s"CHANGED$i" else s"tok$i").mkString(" ")
    step(Seq((1L, base), (50L, (1 to 40).map(i => s"zzz$i").mkString(" "))), 0L)
    step(Seq((2L, mut(10))), 1L)        // B ~ A → under DedupStream, B
    step(Seq((3L, mut(10, 30))), 2L)    // would be rejected+unindexed;
    // C pairs with B (one extra mutation) but not with A (two apart).
    val labels = ClusterStream.clusterLabels(s, s"$root/l")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(1L) == 1L && labels(2L) == 1L && labels(3L) == 1L,
      s"chain through the duplicate did not merge: $labels")
    assert(labels(50L) == 50L)
    // and the pair log shows the chain, not a direct (1,3) pair — the
    // merge really did flow through doc 2
    val pairs = s.read.parquet(s"$root/p").select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs((1L, 2L)) && pairs((2L, 3L)) && !pairs((1L, 3L)), pairs)
  }

  test("replaying a micro-batch is a no-op (batch= overwrite + " +
      "predecessor-snapshot discipline)") {
    val s = TestSpark.spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("cluster_replay").toString
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    def mut(at: Int) = (1 to 40)
      .map(i => if (i == at) s"CHANGED$i" else s"tok$i").mkString(" ")
    def step(docs: Seq[(Long, String)], id: Long): Unit =
      ClusterStream.processBatch(docs.toDF("doc_id", "text"), id,
        "doc_id", "text", s"$root/i", s"$root/p", s"$root/l", 0.5)
    step(Seq((1L, base), (2L, mut(5))), 0L)
    step(Seq((3L, mut(7)), (4L, (1 to 40).map(i => s"qqq$i").mkString(" "))), 1L)
    def state() = (
      ClusterStream.clusterLabels(s, s"$root/l").collect()
        .map(_.toString).sorted.toSeq,
      s.read.parquet(s"$root/p").drop("batch").collect()
        .map(_.toString).sorted.toSeq,
      s.read.parquet(s"$root/i").drop("batch")
        .select("doc_id", "band", "bkey").collect()
        .map(_.toString).sorted.toSeq)
    val before = state()
    // crash-replay of batch 1: same data, same id — must rewrite all
    // three partials from snapshot 0, never double-count or re-merge
    step(Seq((3L, mut(7)), (4L, (1 to 40).map(i => s"qqq$i").mkString(" "))), 1L)
    assert(state() == before)
  }
}
