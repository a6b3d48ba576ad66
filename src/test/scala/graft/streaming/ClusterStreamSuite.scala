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

  private def textFixture(n: Int, tag: String): String =
    (1 to 40).map(i => s"$tag$i").mkString(" ")
  private def mutOf(tag: String, at: Int): String =
    (1 to 40).map(i => if (i == at) s"CHANGED$i" else s"$tag$i").mkString(" ")

  test("alias chains: components merging into ever-smaller NEW ids " +
      "resolve through the pointer-doubling closure") {
    val s = TestSpark.spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("cluster_alias").toString
    def step(docs: Seq[(Long, String)], id: Long): Unit =
      ClusterStream.processBatch(docs.toDF("doc_id", "text"), id,
        "doc_id", "text", s"$root/i", s"$root/p", s"$root/l", 0.5)
    // batch 0: docs 10 and 20, unrelated. batch 1: doc 5 ~ doc 10 —
    // comp 10 merges into the NEW smaller id 5 → alias (10→5). batch 2:
    // doc 1 ~ doc 5 — comp 5 merges into 1 → alias (5→1). Doc 10's
    // delta row still says comp 10; only the chain 10→5→1 gives the
    // truth, so this pins the alias log and its doubling closure.
    step(Seq((10L, textFixture(40, "tok")), (20L, textFixture(40, "zzz"))), 0L)
    step(Seq((5L, mutOf("tok", 7))), 1L)
    step(Seq((1L, mutOf("tok", 7).replace("CHANGED7", "ALSO7"))), 2L)
    val labels = ClusterStream.clusterLabels(s, s"$root/l")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 5L -> 1L, 10L -> 1L, 20L -> 20L), labels)
    // the alias log really holds the two-hop chain
    val aliases = s.read.parquet(s"$root/l/alias")
      .select("from", "to").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(aliases == Set((10L, 5L), (5L, 1L)), aliases)
  }

  test("compactState folds deltas+aliases, labels unchanged; replay of " +
      "the newest batch across the compaction is still a no-op") {
    val s = TestSpark.spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("cluster_compact").toString
    def step(docs: Seq[(Long, String)], id: Long): Unit =
      ClusterStream.processBatch(docs.toDF("doc_id", "text"), id,
        "doc_id", "text", s"$root/i", s"$root/p", s"$root/l", 0.5)
    step(Seq((10L, textFixture(40, "tok")), (20L, textFixture(40, "zzz"))), 0L)
    step(Seq((5L, mutOf("tok", 7))), 1L)
    val batch2 = Seq((1L, mutOf("tok", 7).replace("CHANGED7", "ALSO7")),
      (30L, textFixture(40, "qqq")))
    step(batch2, 2L)
    def labels() = ClusterStream.clusterLabels(s, s"$root/l")
      .collect().map(_.toString).sorted.toSeq
    val before = labels()
    val folded = ClusterStream.compactState(s, s"$root/l")
    assert(folded == 2, s"expected delta partials 0 and 1 folded, got $folded")
    assert(labels() == before)
    // folded deltas carry ROOT comps directly (doc 10's row no longer
    // needs the 10→5→1 chain), and only the newest alias partial remains
    val deltaDirs = new java.io.File(s"$root/l/delta").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).sorted.toSeq
    assert(deltaDirs == Seq("batch=-1", "batch=2"), deltaDirs)
    val foldedRows = s.read.parquet(s"$root/l/delta/batch=-1")
      .select("id", "comp").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(foldedRows == Map(10L -> 1L, 20L -> 20L, 5L -> 1L), foldedRows)
    val aliasDirs = new java.io.File(s"$root/l/alias").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).toSeq
    assert(aliasDirs == Seq("batch=2"), aliasDirs)
    // crash-replay of the newest batch AFTER the compaction: its delta
    // partial was deliberately not folded, so the overwrite leaves one
    // copy of each doc and the same labels
    step(batch2, 2L)
    assert(labels() == before)
    // and maintenance continues over the folded state
    step(Seq((3L, mutOf("qqq", 9))), 3L)
    val after = ClusterStream.clusterLabels(s, s"$root/l")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == Map(1L -> 1L, 5L -> 1L, 10L -> 1L, 20L -> 20L,
      30L -> 3L, 3L -> 3L), after)
  }

  test("plan pin: the endpoint lookup prunes the delta log to the " +
      "touched lb buckets") {
    val s = TestSpark.spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("cluster_prune").toString
    def step(docs: Seq[(Long, String)], id: Long): Unit =
      ClusterStream.processBatch(docs.toDF("doc_id", "text"), id,
        "doc_id", "text", s"$root/i", s"$root/p", s"$root/l", 0.5)
    // 32 docs across both batches → every lb bucket populated
    step((0L until 16L).map(i => (i, textFixture(40, s"a${i}_"))), 0L)
    step((16L until 32L).map(i => (i, textFixture(40, s"b${i}_"))), 1L)
    val probe = LabelLog.lookupRows(s, s"$root/l", 2L,
      Seq(17L).toDF("id"))
    val p = probe.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*lb#[^\\]]*\\]".r.findFirstIn(p).isDefined,
      p.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
    // id 17 hashes to bucket 1 → exactly one of the 16 lb dirs survives
    assert(probe.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((17L, 17L)))
  }

  test("plan pin: the pair-discovery index reads prune too — bb on the " +
      "band store, ib on the id sidecar (index-ALL root)") {
    val s = TestSpark.spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("cluster_bb").toString
    def step(docs: Seq[(Long, String)], id: Long): Unit =
      ClusterStream.processBatch(docs.toDF("doc_id", "text"), id,
        "doc_id", "text", s"$root/i", s"$root/p", s"$root/l", 0.5)
    step(Seq((10L, textFixture(40, "tok")), (20L, textFixture(40, "zzz"))), 0L)
    step(Seq((30L, textFixture(40, "qqq"))), 1L)
    val bands = DedupStream.indexBandsRead(s, s"$root/i", "doc_id",
      Seq(0, 1, 2), 2L)
    val pb = bands.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bb#[^\\]]*\\]".r.findFirstIn(pb).isDefined,
      pb.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
    val ib10 = Seq(10L).toDF("x")
      .select(IdSidecar.bucket(col("x"), IdSidecar.Buckets)).head.getInt(0)
    val sidecar = IdSidecar.read(s, s"$root/i", Seq(ib10), 2L)
    val ps = sidecar.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*ib#[^\\]]*\\]".r.findFirstIn(ps).isDefined,
      ps.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
    // index-ALL: every ingested doc has exactly one sidecar row
    assert(sidecar.filter(col("doc_id") === 10L).count() == 1L)
    assert(s.read.parquet(IdSidecar.root(s"$root/i")).count() == 3L)
  }
}
