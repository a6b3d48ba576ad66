package graft.streaming

import graft.TestSpark
import graft.api.Graft
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucket counts as INDEX METADATA (r16 — r15 verdict #3): the `bb=` /
  * `ib=` / `lb=` fan-outs used to be compile-time constants shared by
  * writer and reader, so raising one at scale would have made readers
  * prune NEW bucket values against runs written at the OLD count —
  * silently losing candidates (wrong answers, not slow ones). Now the
  * count is stamped per store (what new runs write) and per run (what
  * that run's partitions were hashed with), probes prune each run
  * group at its own count, and compaction never merges runs across
  * counts (label folds re-bucket instead). Pinned here:
  *
  *  - a raised band-store count never loses a candidate: docs indexed
  *    at 64 buckets still pair with batches probed after the raise to
  *    256, and first-write-wins membership still holds across eras;
  *  - tiered compaction groups by count — no fold output ever mixes
  *    hash spaces — and probes are identical across the folds;
  *  - a raised label-log count: old endpoints still resolve (the
  *    lookup prunes old runs at 16, new runs at 64), and the
  *    contraction re-buckets the folded base to the raised count;
  *  - an unstamped legacy run reads at the frozen default.
  */
class BucketMetaSuite extends AnyFunSuite {

  private def s = TestSpark.spark

  private def fs(dir: String) = new Path(dir).getFileSystem(
    s.sparkContext.hadoopConfiguration)

  private def stampOf(root: String, d: String): Option[String] =
    IndexCompaction.readRunMeta(s, root, d, BucketMeta.File)

  private def runNames(root: String): Seq[String] = {
    val f = fs(root)
    val p = new Path(root)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("batch=")).sorted
  }

  private def doc(tag: String) = (1 to 40).map(i => s"$tag$i").mkString(" ")
  private def mut(at: Int) = (1 to 40)
    .map(i => if (i == at) s"CHANGED$at" else s"tok$i").mkString(" ")

  test("band store + sidecar: a raised count loses no candidate across " +
      "eras, first-write-wins holds, compaction never mixes hash spaces") {
    val sp = s
    import sp.implicits._
    val root = java.nio.file.Files.createTempDirectory("bucketraise").toFile
    val idx = new java.io.File(root, "index").getAbsolutePath
    val prs = new java.io.File(root, "pairs").getAbsolutePath
    def step(docs: Seq[(Long, String)], id: Long): Unit =
      DedupStream.processBatch(docs.toDF("id", "body"), id,
        "id", "body", idx, prs, threshold = 0.5): Unit
    def pairs() = DedupStream.readPairs(s, prs)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // era 1: defaults (bb=64, ib=16), stamped at creation
    step(Seq((1L, doc("tok")), (2L, doc("aaa"))), 0L)
    step(Seq((3L, doc("zzz"))), 1L)
    assert(BucketMeta.storeCount(s, idx, -1) == DedupStream.BbBuckets)
    assert(stampOf(idx, "batch=0").contains("64"))
    assert(stampOf(IdSidecar.root(idx), "batch=0").contains("16"))

    // the raise: new runs at bb=256 / ib=64; old runs untouched
    Graft.setIndexBuckets(s, idx, 256)
    Graft.setIndexBuckets(s, IdSidecar.root(idx), 64)
    step(Seq((9L, mut(20)), (10L, doc("qqq"))), 2L)
    assert(stampOf(idx, "batch=2").contains("256"))
    assert(stampOf(IdSidecar.root(idx), "batch=2").contains("64"))

    // the recall claim: doc 9 (probed after the raise) pairs with doc 1
    // (indexed before it) — pruning old runs at the NEW count would
    // have read the wrong bb partitions and missed the candidate, and
    // the ib-pruned Jaccard verify reads doc 1's shingles across eras
    assert(pairs().contains((1L, 9L)),
      s"cross-era candidate lost after the raise: ${pairs()}")

    // first-write-wins across eras: a re-crawl of doc 1 adds no rows
    def doc1Rows() = DedupStream.readIndex(s, idx)
      .filter(col("id") === 1L).count()
    val before = doc1Rows()
    step(Seq((1L, doc("tok"))), 3L)
    assert(doc1Rows() == before,
      "re-crawled id re-indexed — membership lookup missed the old era")

    // tiered compaction: counts never mix — with two eras live the
    // store cannot collapse to one run, every fold output is stamped,
    // and probes are unchanged
    val wantPairs = pairs()
    Graft.compactIndexTiered(s, idx, fanIn = 2, keepNewest = 0): Unit
    val bandRuns = runNames(idx)
    assert(bandRuns.size >= 2,
      s"mixed-count runs merged into one hash space: $bandRuns")
    bandRuns.foreach { d =>
      assert(stampOf(idx, d).nonEmpty, s"fold output unstamped: $d")
    }
    assert(bandRuns.map(d => stampOf(idx, d).get).toSet == Set("64", "256"))

    // and ingestion + probing continue correctly over the mixed layout
    step(Seq((15L, mut(22))), 4L)
    assert(pairs() == wantPairs + ((1L, 15L)),
      s"post-compaction cross-era probe broke: ${pairs()}")
  }

  test("label log: a raised lb count keeps old endpoints resolvable and " +
      "the contraction re-buckets the folded base") {
    val sp = s
    import sp.implicits._
    val root = java.nio.file.Files.createTempDirectory("bucketlbl").toString

    LabelLog.advance(s, root, 0L, (1L to 8L).toDF("id"),
      Seq.empty[(Long, Long)].toDF("e1", "e2"))
    LabelLog.advance(s, root, 1L, Seq(101L).toDF("id"),
      Seq((8L, 7L)).toDF("e1", "e2"))
    assert(stampOf(s"$root/delta", "batch=0").contains("16"))

    Graft.setIndexBuckets(s, s"$root/delta", 64)
    // merges whose OLD endpoints live in 16-bucket runs: the lookup
    // must prune those runs at 16 (pruning at 64 reads the wrong lb
    // partitions, loses the endpoint, and mislabels the merge)
    LabelLog.advance(s, root, 2L, Seq(102L).toDF("id"),
      Seq((7L, 2L)).toDF("e1", "e2"))
    assert(stampOf(s"$root/delta", "batch=2").contains("64"))
    def labels() = LabelLog.serve(s, root, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L,
      6L -> 6L, 7L -> 2L, 8L -> 2L, 101L -> 101L, 102L -> 102L)
    assert(labels() == want, s"cross-era endpoint lookup broke: ${labels()}")

    // the monolithic contraction re-buckets the folded base to 64 and
    // stamps it; labels unchanged; lookups over the folded base work
    assert(LabelLog.compactState(s, root) > 0)
    val folded = runNames(s"$root/delta")
      .filter(_.stripPrefix("batch=").toLong < 0)
    assert(folded.nonEmpty)
    folded.foreach { d =>
      assert(stampOf(s"$root/delta", d).contains("64"),
        s"contraction did not re-bucket $d to the raised count")
      // lb values in a 64-bucket run may exceed 15 — proof the rows
      // really were re-hashed, not just re-stamped
      val lbs = s.read.parquet(s"$root/delta/$d")
        .select("lb").distinct().collect().map(_.getInt(0)).toSet
      val ids = s.read.parquet(s"$root/delta/$d")
        .select("id").collect().map(_.getLong(0)).toSet
      assert(lbs == ids.map(i => (i % 64).toInt),
        s"run $d lb values not re-bucketed at 64: $lbs")
    }
    assert(labels() == want)
    LabelLog.advance(s, root, 3L, Seq(103L).toDF("id"),
      Seq((2L, 1L)).toDF("e1", "e2"))
    val after = labels()
    assert(after(7L) == 1L && after(8L) == 1L && after(2L) == 1L,
      s"post-contraction merge over the re-bucketed base broke: $after")
  }

  test("coarse partials / fine base: writers commit a small fan, " +
      "rebucket folds refine to the serving counts, probes stay " +
      "correct throughout") {
    val sp = s
    import sp.implicits._
    val root = java.nio.file.Files.createTempDirectory("coarsefine").toFile
    val idx = new java.io.File(root, "index").getAbsolutePath
    val prs = new java.io.File(root, "pairs").getAbsolutePath
    // CREATION at coarse counts — the tiny-micro-batch deployment: a
    // batch commits at most 8 band files + 4 sidecar files
    Graft.setIndexBuckets(s, idx, 8)
    Graft.setIndexBuckets(s, IdSidecar.root(idx), 4)
    def step(docs: Seq[(Long, String)], id: Long): Unit =
      DedupStream.processBatch(docs.toDF("id", "body"), id,
        "id", "body", idx, prs, threshold = 0.5): Unit
    def pairs() = DedupStream.readPairs(s, prs)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    step(Seq((1L, doc("tok")), (2L, doc("aaa"))), 0L)
    step(Seq((3L, doc("zzz"))), 1L)
    step(Seq((9L, mut(20)), (10L, doc("qqq"))), 2L)
    step(Seq((11L, doc("rrr"))), 3L)
    step(Seq((12L, mut(22))), 4L)
    assert(pairs().contains((1L, 9L)) && pairs().contains((1L, 12L)))
    val f = fs(idx)
    assert(stampOf(idx, "batch=0").contains("8"))
    assert(f.listStatus(new Path(s"$idx/batch=0"))
      .count(_.getPath.getName.startsWith("bb=")) <= 8,
      "coarse partial committed more than its fan")

    // refine: folded runs graduate to the fine serving counts
    val st = Graft.rebucketIndexTiered(s, idx, toBands = 64, toIds = 16,
      fanIn = 2)
    assert(st.folds >= 1 && st.maxFoldConsumed <= 2)
    val fine = runNames(idx).filter(_.stripPrefix("batch=").toLong < 0)
    assert(fine.nonEmpty)
    fine.foreach(d => assert(stampOf(idx, d).contains("64"),
      s"refined run not stamped 64: $d"))
    runNames(IdSidecar.root(idx))
      .filter(_.stripPrefix("batch=").toLong < 0)
      .foreach(d => assert(stampOf(IdSidecar.root(idx), d).contains("16")))
    // the rows really re-hashed into the finer space (a coarse run
    // could never hold a bucket ≥ 8)
    assert(fine.exists(d => f.listStatus(new Path(s"$idx/$d"))
      .exists(st => st.getPath.getName.startsWith("bb=") &&
        st.getPath.getName.stripPrefix("bb=").toInt >= 8)),
      "no refined bucket above the coarse fan — rows were not re-hashed")

    // probes stay correct over the MIXED layout (coarse raw newest +
    // fine folded base): a new near-dup of the era-1 hub still pairs
    val wantPairs = pairs()
    step(Seq((20L, mut(24))), 5L)
    assert(pairs() == wantPairs + ((1L, 20L)),
      s"probe over the coarse/fine mix broke: ${pairs()}")
  }

  test("emb and media stores: raised sb=/mb= counts lose no candidate " +
      "across eras") {
    val sp = s
    import sp.implicits._
    // EMB: era 1 at the default sb fan; raise; the era-2 probe must
    // still find its era-1 partner (pruning old runs at the new count
    // would read the wrong sb partitions)
    val eroot = java.nio.file.Files.createTempDirectory("bucketemb").toFile
    val eidx = new java.io.File(eroot, "index").getAbsolutePath
    val eprs = new java.io.File(eroot, "pairs").getAbsolutePath
    EmbDedupStream.processBatch(
      Seq((1L, Array(1f, -0.1f, 0f)), (2L, Array(-0.1f, 1f, 0f)))
        .toDF("id", "emb"),
      0L, "id", "emb", eidx, eprs, threshold = 0.9, nPlanes = 2): Unit
    assert(stampOf(eidx, "batch=0").contains("64"))
    Graft.setIndexBuckets(s, eidx, 512)
    EmbDedupStream.processBatch(
      Seq((9L, Array(0.99f, -0.1f, 0.01f))).toDF("id", "emb"),
      1L, "id", "emb", eidx, eprs, threshold = 0.9, nPlanes = 2): Unit
    assert(stampOf(eidx, "batch=1").contains("512"))
    val epairs = EmbDedupStream.readPairs(s, eprs)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(epairs.contains((1L, 9L)),
      s"emb cross-era candidate lost after the raise: $epairs")

    // MEDIA: same claim on the mb= band layout (twin fingerprints at
    // hamming 1 across the raise)
    val mroot = java.nio.file.Files.createTempDirectory("bucketmed").toFile
    val midx = new java.io.File(mroot, "index").getAbsolutePath
    val mprs = new java.io.File(mroot, "pairs").getAbsolutePath
    val mq = new java.io.File(mroot, "q").getAbsolutePath
    def payload(h: Long): Array[Byte] =
      java.nio.ByteBuffer.allocate(8).putLong(h).array()
    val kernel: Array[Byte] => Either[String, Long] =
      b => Right(java.nio.ByteBuffer.wrap(b).getLong)
    MediaDedupStream.processBatch(
      Seq((1L, payload(0x0123456789ABCDEFL)),
        (2L, payload(0x7EDCBA9876543210L))).toDF("doc_id", "payload"),
      0L, "doc_id", "payload", kernel, midx, mprs, mq): Unit
    assert(stampOf(midx, "batch=0").contains("64"))
    Graft.setIndexBuckets(s, midx, 512)
    MediaDedupStream.processBatch(
      Seq((9L, payload(0x0123456789ABCDEEL))).toDF("doc_id", "payload"),
      1L, "doc_id", "payload", kernel, midx, mprs, mq): Unit
    assert(stampOf(midx, "batch=1").contains("512"))
    val mpairs = MediaDedupStream.readPairs(s, mprs)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mpairs.contains((1L, 9L)),
      s"media cross-era candidate lost after the raise: $mpairs")
  }

  test("an unstamped legacy run reads at the frozen default") {
    val sp = s
    import sp.implicits._
    val root = java.nio.file.Files.createTempDirectory("bucketlegacy").toString
    LabelLog.advance(s, root, 0L, (1L to 8L).toDF("id"),
      Seq.empty[(Long, Long)].toDF("e1", "e2"))
    // strip the stamps — the pre-r16 layout
    val f = fs(root)
    f.delete(new Path(s"$root/delta/${BucketMeta.File}"), false)
    f.delete(new Path(s"$root/delta/batch=0/${BucketMeta.File}"), false)
    // a lookup against the legacy run prunes at the default and finds
    // its endpoints
    LabelLog.advance(s, root, 1L, Seq(101L).toDF("id"),
      Seq((8L, 7L)).toDF("e1", "e2"))
    val labels = LabelLog.serve(s, root, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(8L) == 7L && labels(7L) == 7L,
      s"legacy-run lookup broke: $labels")
  }
}
