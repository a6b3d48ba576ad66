package graft.streaming

import graft.TestSpark
import graft.api.Graft
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spec for [[IndexCompaction.compactTiered]] (r15 — the 100-TB
  * compaction schedule): every fold must consume at most `fanIn` runs
  * (no invocation is a corpus-sized rewrite), rows and partition-pruned
  * probes must be identical before and after, the replay guards
  * (`keepNewest`, uncommitted partials) must match [[IndexCompaction
  * .compact]]'s, byte-free partials must be retired rather than spun
  * on, and a committed crashed fold must roll forward on entry. */
class TieredCompactionSuite extends AnyFunSuite {

  private def fs(root: String) = new Path(root).getFileSystem(
    TestSpark.spark.sparkContext.hadoopConfiguration)

  private def batchDirNames(root: String): Seq[String] =
    fs(root).listStatus(new Path(root)).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("batch=")).sorted

  private def rowSet(df: DataFrame): Set[(Long, String)] =
    df.select("id", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  /** `n` committed flat partials of `rows` rows each under `root`. */
  private def writePartials(root: String, n: Int, rows: Int): Unit = {
    val s = TestSpark.spark
    import s.implicits._
    (0 until n).foreach { b =>
      (0 until rows).map(i => (b.toLong * rows + i, s"v$b-$i"))
        .toDF("id", "v").coalesce(1)
        .write.mode("overwrite").parquet(s"$root/batch=$b")
    }
  }

  test("flat log: rows preserved, no fold consumes more than fanIn, " +
      "run count collapses, converged re-invocation is a no-op") {
    val s = TestSpark.spark
    val root = java.nio.file.Files.createTempDirectory("tiered_flat")
      .toFile.getAbsolutePath
    writePartials(root, n = 16, rows = 400)
    val want = rowSet(s.read.parquet(root).drop("batch"))

    val stats = IndexCompaction.compactTiered(s, root, fanIn = 4)
    assert(stats.maxFoldConsumed == 4,
      "a tiered fold must never consume more runs than the fan-in")
    assert(stats.folds >= 4 && stats.dirsConsumed >= 16)
    assert(batchDirNames(root).size <= 4)
    assert(batchDirNames(root).forall(_.stripPrefix("batch=").toLong < 0))
    assert(rowSet(s.read.parquet(root).drop("batch")) == want)

    // equal-sized inputs converge to one run; once no tier reaches
    // fan-in, another invocation does nothing
    val again = IndexCompaction.compactTiered(s, root, fanIn = 4)
    if (batchDirNames(root).size < 4) assert(again.folds == 0)
    assert(rowSet(s.read.parquet(root).drop("batch")) == want)
  }

  test("keepNewest and uncommitted partials are never consumed") {
    val s = TestSpark.spark
    val root = java.nio.file.Files.createTempDirectory("tiered_keep")
      .toFile.getAbsolutePath
    writePartials(root, n = 9, rows = 200)
    val f = fs(root)
    // batch=8 loses its _SUCCESS: a crashed write awaiting replay
    f.delete(new Path(s"$root/batch=8/_SUCCESS"), false)
    val want = rowSet(s.read.parquet(root).drop("batch"))

    IndexCompaction.compactTiered(s, root, fanIn = 4, keepNewest = 1)
    val names = batchDirNames(root)
    assert(names.contains("batch=7"), "newest committed id is protected")
    assert(names.contains("batch=8"), "uncommitted partial is protected")
    assert(rowSet(s.read.parquet(root).drop("batch")) == want)
  }

  test("byte-free partials are retired in one fold, not spun on") {
    val s = TestSpark.spark
    val root = java.nio.file.Files.createTempDirectory("tiered_empty")
      .toFile.getAbsolutePath
    writePartials(root, n = 2, rows = 300)
    val f = fs(root)
    // four _SUCCESS-only partials — what a partitionBy write of an
    // empty micro-batch leaves behind
    (10 to 13).foreach { b =>
      f.mkdirs(new Path(s"$root/batch=$b"))
      f.create(new Path(s"$root/batch=$b/_SUCCESS"), true).close()
    }
    val want = rowSet(s.read.parquet(root).drop("batch"))

    val stats = IndexCompaction.compactTiered(s, root, fanIn = 4)
    assert(stats.folds == 1 && stats.bytesRewritten == 0L)
    val names = batchDirNames(root)
    assert(!names.exists(n => (10 to 13).contains(
      n.stripPrefix("batch=").toInt)), "empty partials retired")
    assert(names == Seq("batch=0", "batch=1"),
      "two real partials are below fan-in and stay")
    assert(rowSet(s.read.parquet(root).drop("batch")) == want)

    // a root holding ONLY byte-free partials retires them without a
    // schema-inference read
    val bare = java.nio.file.Files.createTempDirectory("tiered_bare")
      .toFile.getAbsolutePath
    (0 to 3).foreach { b =>
      f.mkdirs(new Path(s"$bare/batch=$b"))
      f.create(new Path(s"$bare/batch=$b/_SUCCESS"), true).close()
    }
    val bareStats = IndexCompaction.compactTiered(s, bare, fanIn = 4)
    assert(bareStats.folds == 1 && batchDirNames(bare).isEmpty)
  }

  test("signature index + sidecar: probes, pruning scheme, and replay " +
      "idempotence identical across tiered folds") {
    val s = TestSpark.spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("tiered_sig").toFile
    val idx = new java.io.File(root, "index").getAbsolutePath
    val prs = new java.io.File(root, "pairs").getAbsolutePath
    def doc(tag: String) = (1 to 40).map(i => s"$tag$i").mkString(" ")
    def mut(at: Int) =
      (1 to 40).map(i => if (i == at) s"CHANGED$at" else s"tok$i")
        .mkString(" ")

    val batches: Seq[Seq[(Long, String)]] = Seq(
      Seq((1L, doc("tok")), (2L, doc("aaa"))),
      Seq((9L, mut(20)), (10L, doc("zzz"))),
      Seq((12L, mut(22)), (13L, doc("qqq"))),
      Seq((15L, doc("rrr")), (16L, doc("sss"))))
    batches.zipWithIndex.foreach { case (b, i) =>
      DedupStream.processBatch(b.toDF("id", "body"), i.toLong,
        "id", "body", idx, prs, threshold = 0.5)
    }
    def idxRows() = DedupStream.readIndex(s, idx)
      .select(col("id"), col("band"), col("bkey"),
        coalesce(col("hs"), expr("array()")).as("hs"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getSeq[Long](3).toVector)).toSet
    def prsRows() = DedupStream.readPairs(s, prs)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantIdx = idxRows()
    val wantPrs = prsRows()
    assert(wantPrs.contains((1L, 9L)) && wantPrs.contains((1L, 12L)))

    val stats = Graft.compactIndexTiered(s, idx, fanIn = 2)
    assert(stats.folds >= 2 && stats.maxFoldConsumed == 2)
    assert(idxRows() == wantIdx)
    // the bb= scheme survives inside every folded run (partition-pruned
    // probes keep pruning)
    val f = fs(idx)
    batchDirNames(idx).foreach { d =>
      assert(f.listStatus(new Path(s"$idx/$d")).exists(
        _.getPath.getName.startsWith("bb=")), s"bb= scheme lost in $d")
    }
    batchDirNames(IdSidecar.root(idx)).foreach { d =>
      assert(f.listStatus(new Path(s"${IdSidecar.root(idx)}/$d")).exists(
        _.getPath.getName.startsWith("ib=")), s"ib= scheme lost in $d")
    }

    // ingestion continues over the tiered layout, and a replay of the
    // same batch id stays idempotent
    val b4 = Seq((14L, mut(24)), (17L, doc("mmm")))
    DedupStream.processBatch(b4.toDF("id", "body"), 4L,
      "id", "body", idx, prs, threshold = 0.5)
    val afterPrs = prsRows()
    assert(afterPrs == wantPrs + ((1L, 14L)))
    DedupStream.processBatch(b4.toDF("id", "body"), 4L,
      "id", "body", idx, prs, threshold = 0.5)
    assert(prsRows() == afterPrs)
  }

  test("maxRunBytes ceiling: a run at the ceiling stops merging — no " +
      "fold ever approaches the index's size") {
    val s = TestSpark.spark
    val root = java.nio.file.Files.createTempDirectory("tiered_ceil")
      .toFile.getAbsolutePath
    writePartials(root, n = 8, rows = 400)
    val f = fs(root)
    val partialBytes = batchDirNames(root)
      .map(d => IndexCompaction.dataBytes(f, new Path(s"$root/$d")))
    val want = rowSet(s.read.parquet(root).drop("batch"))
    // ceiling just above one partial: any pairwise merge graduates past
    // it and becomes ineligible, so the log can never collapse to one
    // corpus-sized run — it converges to n/fanIn ceiling-sized runs
    val ceiling = partialBytes.max + 1L
    val stats = IndexCompaction.compactTiered(s, root, fanIn = 2,
      maxRunBytes = ceiling)
    assert(stats.maxFoldConsumed == 2)
    assert(stats.folds == 4, "each pair merges once, then is at ceiling")
    // each merge consumes 2 below-ceiling runs (~1/4 of the index);
    // written bytes ≈ consumed bytes modulo re-encoding overhead — the
    // barrier claim is that no single fold approaches the index's size
    assert(stats.maxFoldBytes > 0L &&
      stats.maxFoldBytes <= partialBytes.sum / 2,
      "no single merge approaches the accumulated index's size")
    val names = batchDirNames(root)
    assert(names.size == 4)
    assert(names.forall(d =>
      IndexCompaction.dataBytes(f, new Path(s"$root/$d")) >= ceiling),
      "every surviving merged run sits at/above the ceiling")
    assert(rowSet(s.read.parquet(root).drop("batch")) == want)

    // converged: nothing below the ceiling reaches fan-in
    val again = IndexCompaction.compactTiered(s, root, fanIn = 2,
      maxRunBytes = ceiling)
    assert(again.folds == 0)
    assert(rowSet(s.read.parquet(root).drop("batch")) == want)

    // without the ceiling the same root collapses all the way
    val full = IndexCompaction.compactTiered(s, root, fanIn = 2)
    assert(full.folds > 0)
    assert(batchDirNames(root).size == 1)
    assert(rowSet(s.read.parquet(root).drop("batch")) == want)
  }

  test("BM25 family: tiered folds preserve the tb= scheme, the summed " +
      "stats deltas, and the pruned serve") {
    val s = TestSpark.spark
    val sf = "/root/testdata/sf0.001"
    val root = java.nio.file.Files.createTempDirectory("tiered_bm25").toString
    val docs = graft.Tables.documents(s, sf)
      .select(col("doc_id"), col("text"))
    (0 until 6).foreach { b =>
      Bm25Stream.processBatch(docs.filter(expr(s"doc_id % 6 = $b")),
        b.toLong, s"$root/p", s"$root/l", s"$root/st")
    }
    def served() = Bm25Stream.serveFrom(s, s"$root/p", s"$root/st")
    val want = served().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    // the stats store is the ADDITIVE union-read case: per-batch 1-row
    // deltas whose sum is the global — a subset fold must preserve the
    // row set (and so the sum), not collapse it to one pre-summed row
    Seq(s"$root/p", s"$root/l", s"$root/st").foreach { store =>
      val st = IndexCompaction.compactTiered(s, store, fanIn = 2)
      assert(st.maxFoldConsumed <= 2)
    }
    val after = served()
    assert(after.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq == want)
    val plan = after.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*tb#[^\\]]*\\]".r
      .findFirstIn(plan).isDefined, plan.linesIterator
      .filter(_.contains("PartitionFilters")).mkString("\n"))
  }

  test("label log: tiered delta folds contract through the closure, " +
      "retire covered aliases, and leave labels, lb= pruning, ongoing " +
      "maintenance, and the monolithic verb intact") {
    val s = TestSpark.spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("tiered_labels").toString
    def text(tag: String) = (1 to 40).map(i => s"$tag$i").mkString(" ")
    def mut(tag: String, at: Int, m: String) = (1 to 40)
      .map(i => if (i == at) s"$m$i" else s"$tag$i").mkString(" ")
    def step(docs: Seq[(Long, String)], id: Long): Unit =
      ClusterStream.processBatch(docs.toDF("doc_id", "text"), id,
        "doc_id", "text", s"$root/i", s"$root/p", s"$root/l", 0.5)
    def labels() = ClusterStream.clusterLabels(s, s"$root/l")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def aliases() = s.read.parquet(s"$root/l/alias")
      .select("from", "to").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the ClusterStreamSuite alias-chain fixture, padded to 5 batches
    // so keepNewest=1 leaves 4 foldable delta partials
    step(Seq((10L, text("tok")), (20L, text("zzz"))), 0L)
    step(Seq((5L, mut("tok", 7, "CHANGED"))), 1L)  // alias 10 -> 5
    step(Seq((1L, mut("tok", 7, "ALSO"))), 2L)     // alias 5 -> 1
    step(Seq((30L, text("qqq"))), 3L)
    step(Seq((40L, text("rrr"))), 4L)
    val wantLabels = labels()
    val wantAliases = aliases()
    assert(wantLabels == Map(1L -> 1L, 5L -> 1L, 10L -> 1L, 20L -> 20L,
      30L -> 30L, 40L -> 40L), wantLabels)
    assert(wantAliases == Set((10L, 5L), (5L, 1L)), wantAliases)

    val st = ClusterStream.compactStateTiered(s, s"$root/l", fanIn = 2)
    assert(st.folds >= 1 && st.maxFoldConsumed <= 2)
    assert(labels() == wantLabels, "closure delta folds changed labels")
    // r16: each fold applies the alias closure and stamps its fold
    // high-water mark; retirement may only DELETE whole alias partials
    // all runs post-date — never alter surviving rows
    assert(aliases().subsetOf(wantAliases),
      "retirement altered surviving alias rows")
    // lb= pruning scheme + hwm stamp survive inside every folded run
    val f = fs(s"$root/l/delta")
    val deltaRuns = batchDirNames(s"$root/l/delta")
    assert(deltaRuns.exists(_.stripPrefix("batch=").toLong < 0))
    deltaRuns.filter(_.stripPrefix("batch=").toLong < 0).foreach { d =>
      assert(f.listStatus(new Path(s"$root/l/delta/$d")).exists(
        _.getPath.getName.startsWith("lb=")), s"lb= scheme lost in $d")
      assert(f.exists(new Path(s"$root/l/delta/$d/${LabelLog.HwmFile}")),
        s"fold high-water stamp missing in $d")
    }

    // maintenance continues across the tiered fold (a merge whose old
    // endpoint's comp lives in a folded run), and a replay is a no-op
    step(Seq((3L, mut("tok", 7, "ALSO").replace("ALSO7", "TOO7"))), 5L)
    val merged = labels()
    assert(merged(3L) == 1L, s"post-fold merge failed: $merged")
    step(Seq((3L, mut("tok", 7, "ALSO").replace("ALSO7", "TOO7"))), 5L)
    assert(labels() == merged, "replay across the tiered fold moved labels")

    // the monolithic contraction still composes over tiered-folded runs
    assert(ClusterStream.compactState(s, s"$root/l") > 0)
    assert(labels() == merged, "contraction over tiered runs moved labels")
    assert(s.read.parquet(s"$root/l/delta").drop("batch")
      .filter(col("id") === 10L).head().getLong(1) == 1L,
      "contraction did not rewrite the folded row's comp to its root")
  }

  test("a committed crashed fold rolls forward on entry") {
    val s = TestSpark.spark
    val root = java.nio.file.Files.createTempDirectory("tiered_crash")
      .toFile.getAbsolutePath
    writePartials(root, n = 4, rows = 200)
    val f = fs(root)
    // hand-build the state a crash between manifest write and swap
    // leaves: staging holds batches 0+1's rows, manifest names them
    s.read.parquet(root).filter(col("batch").isin(0L, 1L))
      .drop("batch").coalesce(1)
      .write.parquet(s"$root/_graft_compact_tmp")
    val out = f.create(new Path(s"$root/_graft_compact_manifest"), true)
    out.write("-1\nbatch=0\nbatch=1".getBytes("UTF-8")); out.close()
    // expected rows come from the generator, not a pre-recover read —
    // the consumed dirs still exist beside staging until roll-forward
    val wantRows = Set(0L, 1L, 2L, 3L).flatMap { b =>
      (0 until 200).map(i => (b * 200 + i, s"v$b-$i"))
    }

    IndexCompaction.compactTiered(s, root, fanIn = 4)
    assert(rowSet(s.read.parquet(root).drop("batch")) == wantRows)
    assert(!f.exists(new Path(s"$root/_graft_compact_manifest")))
    assert(!f.exists(new Path(s"$root/_graft_compact_tmp")))
  }
}
