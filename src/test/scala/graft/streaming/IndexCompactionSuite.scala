package graft.streaming

import graft.TestSpark
import graft.api.Graft
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spec for [[IndexCompaction]] (round-9 verdict #5): compaction must be
  * invisible to every reader — identical index rows, identical pair
  * log, identical partition-pruned probe results — while collapsing the
  * accumulated `batch=<id>` directories into one, and a crashed
  * compaction must resolve deterministically on either side of the
  * manifest commit point. */
class IndexCompactionSuite extends AnyFunSuite {

  private def doc(tag: String) = (1 to 40).map(i => s"$tag$i").mkString(" ")
  private def mut(at: Int) =
    (1 to 40).map(i => if (i == at) s"CHANGED$at" else s"tok$i").mkString(" ")
  private val base = doc("tok")

  private def batchDirNames(root: String): Seq[String] = {
    val p = new Path(root)
    val fs = p.getFileSystem(
      TestSpark.spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("batch=")).sorted
  }

  private def indexRows(df: DataFrame) = df
    .select(col("id"), col("band"), col("bkey"),
      coalesce(col("hs"), expr("array()")).as("hs"))
    .collect()
    .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
      r.getSeq[Long](3).toVector)).toSet

  private def pairRows(df: DataFrame) =
    df.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("signature index + pair log: rows, later probes, and replay " +
      "idempotence are identical across compaction; re-compaction nests") {
    val s = TestSpark.spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("compact_sig").toFile
    val idx = new java.io.File(root, "index").getAbsolutePath
    val prs = new java.io.File(root, "pairs").getAbsolutePath

    val batches: Seq[Seq[(Long, String)]] = Seq(
      Seq((1L, base), (2L, doc("aaa"))),
      Seq((9L, mut(20)), (10L, doc("zzz"))),
      Seq((12L, mut(22)), (13L, doc("qqq"))))
    batches.zipWithIndex.foreach { case (b, i) =>
      DedupStream.processBatch(b.toDF("id", "body"), i.toLong,
        "id", "body", idx, prs, threshold = 0.5)
    }
    val wantIdx = indexRows(DedupStream.readIndex(s, idx))
    val wantPrs = pairRows(DedupStream.readPairs(s, prs))
    assert(wantPrs.contains((1L, 9L)) && wantPrs.contains((1L, 12L)))
    assert(batchDirNames(idx).size == 3)

    // 3 band-store partials + 3 id-sidecar partials fold together
    assert(Graft.compactIndex(s, idx) == 6)
    assert(Graft.compactIndex(s, prs) == 3)
    assert(batchDirNames(idx) == Seq("batch=-1"))
    assert(batchDirNames(IdSidecar.root(idx)) == Seq("batch=-1"))
    assert(batchDirNames(prs) == Seq("batch=-1"))
    assert(indexRows(DedupStream.readIndex(s, idx)) == wantIdx)
    assert(pairRows(DedupStream.readPairs(s, prs)) == wantPrs)
    // compacting a compacted root is a no-op
    assert(Graft.compactIndex(s, idx) == 0)

    // ingestion continues across the compaction: a new batch probes the
    // compacted index exactly as it would have probed the uncompacted
    // one (14 ~ base → pair with the indexed 1), and its replay-guard
    // (batch =!= 3 against the compacted id −1) keeps working
    val b3 = Seq((14L, mut(24)), (15L, doc("mmm")))
    DedupStream.processBatch(b3.toDF("id", "body"), 3L,
      "id", "body", idx, prs, threshold = 0.5)
    val afterPrs = pairRows(DedupStream.readPairs(s, prs))
    assert(afterPrs == wantPrs + ((1L, 14L)))
    DedupStream.processBatch(b3.toDF("id", "body"), 3L,
      "id", "body", idx, prs, threshold = 0.5) // replay
    assert(pairRows(DedupStream.readPairs(s, prs)) == afterPrs)

    // re-compaction folds the compacted dir with the new batch: the
    // next negative id nests below the previous one, rows unchanged
    val wantIdx2 = indexRows(DedupStream.readIndex(s, idx))
    assert(Graft.compactIndex(s, idx) == 4)
    assert(batchDirNames(idx) == Seq("batch=-2"))
    assert(batchDirNames(IdSidecar.root(idx)) == Seq("batch=-2"))
    assert(indexRows(DedupStream.readIndex(s, idx)) == wantIdx2)
  }

  test("vector index: partition-pruned probe results identical across " +
      "compaction, cluster= scheme preserved inside the compacted dir") {
    val s = TestSpark.spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("compact_vidx").toFile
    val idx = new java.io.File(root, "index").getAbsolutePath

    val batches: Seq[Seq[(Long, Array[Float])]] = Seq(
      Seq((1L, Array(1f, 0.05f)), (2L, Array(0.05f, 1f))),
      Seq((3L, Array(0.98f, 0.02f)), (4L, Array(0.02f, 0.97f))),
      Seq((5L, Array(0.99f, 0f)), (6L, Array(0f, 1.01f))))
    batches.zipWithIndex.foreach { case (b, i) =>
      VectorIndexStream.processBatch(b.toDF("vid", "emb"), i.toLong,
        "vid", "emb", idx, k = 2)
    }
    val queries = batches.head.toDF("qid", "emb")
    def probe() = Graft
      .probeVectorIndex(s, idx, "vid", "emb", queries, "qid", k = 3)
    val want = probe().collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(want.nonEmpty)

    assert(Graft.compactIndex(s, idx) == 3)
    assert(batchDirNames(idx) == Seq("batch=-1"))
    // the internal cluster= partitions survive the rewrite
    val p = new Path(s"$idx/batch=-1")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val inner = fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("cluster="))
    assert(inner.size == 2, inner)
    // each cluster directory compacts to a single part file
    inner.foreach { c =>
      val files = fs.listStatus(new Path(p, c)).toSeq
        .filter(_.getPath.getName.startsWith("part-"))
      assert(files.size == 1, s"$c: $files")
    }

    val after = probe()
    assert(after.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq == want)
    // pruning still reaches the scan
    val plan = after.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cluster[^\\]]*\\]".r
      .findFirstIn(plan).isDefined, plan.linesIterator.take(12).mkString("\n"))
    // the frozen centroid table is untouched
    assert(VectorIndexStream.readCentroids(s, idx).count() == 2)
  }

  test("embedding sketch index (sb= layout): a batch ingested after " +
      "compaction produces the same pairs as against the uncompacted index") {
    val s = TestSpark.spark
    import s.implicits._
    val vb: Seq[Seq[(Long, Array[Float])]] = Seq(
      Seq((1L, Array(1f, 0f, 0f)), (2L, Array(0f, 1f, 0f))),
      Seq((3L, Array(0.99f, 0.01f, 0f)), (4L, Array(0f, 0f, 1f))))
    val next = Seq((9L, Array(0.98f, 0f, 0.01f)), (10L, Array(0f, 0.99f, 0f)))
    // two identical roots; one gets compacted between batch 1 and 2
    val roots = Seq("emb_a", "emb_b").map { tag =>
      val r = java.nio.file.Files.createTempDirectory(tag).toFile
      (new java.io.File(r, "index").getAbsolutePath,
        new java.io.File(r, "pairs").getAbsolutePath)
    }
    roots.foreach { case (idx, prs) =>
      vb.zipWithIndex.foreach { case (b, i) =>
        EmbDedupStream.processBatch(b.toDF("vec_id", "embedding"), i.toLong,
          "vec_id", "embedding", idx, prs, threshold = 0.9, nPlanes = 4)
      }
    }
    val (cIdx, cPrs) = roots.head
    assert(Graft.compactIndex(s, cIdx) == 4) // sketch + sidecar partials
    assert(Graft.compactIndex(s, cPrs) >= 0) // pair log may hold < 2 dirs with rows
    roots.foreach { case (idx, prs) =>
      EmbDedupStream.processBatch(next.toDF("vec_id", "embedding"), 2L,
        "vec_id", "embedding", idx, prs, threshold = 0.9, nPlanes = 4)
    }
    def pairs(prs: String) = EmbDedupStream.readPairs(s, prs)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = pairs(cPrs)
    assert(got == pairs(roots(1)._2))
    assert(got.contains((1L, 9L)), got) // probe really hit the compacted index
  }

  test("crash recovery: a committed swap rolls forward, an uncommitted " +
      "one aborts with the original layout intact") {
    val s = TestSpark.spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("compact_crash")
      .toFile.getAbsolutePath
    Seq((1L, base), (2L, doc("aaa"))).toDF("id", "body")
      .withColumn("n", length(col("body")))
      .write.parquet(s"$root/batch=0")
    Seq((3L, doc("bbb")), (4L, doc("ccc"))).toDF("id", "body")
      .withColumn("n", length(col("body")))
      .write.parquet(s"$root/batch=1")
    val want = s.read.parquet(root).drop("batch").collect()
      .map(_.toString).sorted.toSeq
    val fs = new Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

    // Uncommitted crash: consolidated data staged, manifest never
    // written. recover() must discard the staging dir and leave the
    // original batch dirs serving.
    s.read.parquet(root).drop("batch").repartition(1)
      .write.parquet(s"$root/_graft_compact_tmp")
    IndexCompaction.recover(s, root)
    assert(!fs.exists(new Path(root, "_graft_compact_tmp")))
    assert(batchDirNames(root) == Seq("batch=0", "batch=1"))
    assert(s.read.parquet(root).drop("batch").collect()
      .map(_.toString).sorted.toSeq == want)

    // Committed crash: staging complete, manifest written, one consumed
    // dir already retired into backup — the process dies before the
    // promote. recover() must complete the swap exactly as compact()
    // would have.
    s.read.parquet(root).drop("batch").repartition(1)
      .write.parquet(s"$root/_graft_compact_tmp")
    val manifest = "-1\nbatch=0\nbatch=1"
    val out = fs.create(new Path(root, "_graft_compact_manifest"), true)
    out.write(manifest.getBytes("UTF-8")); out.close()
    fs.mkdirs(new Path(root, "_graft_compact_backup"))
    assert(fs.rename(new Path(root, "batch=0"),
      new Path(root, "_graft_compact_backup/batch=0")))
    IndexCompaction.recover(s, root)
    assert(batchDirNames(root) == Seq("batch=-1"))
    assert(!fs.exists(new Path(root, "_graft_compact_manifest")))
    assert(!fs.exists(new Path(root, "_graft_compact_backup")))
    assert(s.read.parquet(root).drop("batch").collect()
      .map(_.toString).sorted.toSeq == want)
    // and recover() on the healed root is a no-op
    IndexCompaction.recover(s, root)
    assert(batchDirNames(root) == Seq("batch=-1"))
  }

  test("retainSnapshots keeps the newest k committed snapshots and " +
      "sweeps both older ones and crash orphans (marker-first delete)") {
    val s = TestSpark.spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("retain_snap")
      .toFile.getAbsolutePath
    (0 until 4).foreach { b =>
      Seq((b.toLong, b.toLong)).toDF("id", "comp")
        .write.mode("overwrite").parquet(s"$root/batch=$b")
    }
    assert(IndexCompaction.retainSnapshots(s, root, keep = 2) == 2)
    assert(batchDirNames(root) == Seq("batch=2", "batch=3"))
    // idempotent on a retained root
    assert(IndexCompaction.retainSnapshots(s, root, keep = 2) == 0)
    // crash simulation: a retention (or snapshot write) died after the
    // _SUCCESS marker was gone but before the directory was — committed
    // discovery must skip the orphan, and the next pass sweeps it even
    // though it is the second-newest id (orphans are stale regardless
    // of age; only COMMITTED snapshots count toward `keep`)
    val fs = new Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new Path(s"$root/batch=2/_SUCCESS"), false)
    assert(IndexCompaction.retainSnapshots(s, root, keep = 2) == 1)
    assert(batchDirNames(root) == Seq("batch=3"))
    // a missing root is a quiet no-op (first run before any snapshot)
    assert(IndexCompaction.retainSnapshots(s, s"$root/nothere") == 0)
  }
}
