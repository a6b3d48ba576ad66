package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dedup semantics on a corpus with KNOWN duplicates — the driver's
  * synthetic documents are all distinct (q_exact_dedup groups 500/500), so
  * the oracle never exercises the collapse paths. This fixture plants an
  * exact duplicate pair, a near-duplicate pair (one word changed), and
  * unrelated documents, and asserts each operator finds exactly what it
  * should. The real query functions run unmodified against a temp dir
  * shaped like the driver's. */
class DedupSemanticsSuite extends AnyFunSuite {

  private lazy val dir: String = {
    val s = TestSpark.spark
    import s.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away " +
      "into the deep green forest where tall trees hide the winding river path"
    val near = base.replace("winding", "ancient") // one token differs
    val docs = Seq(
      (0L, base, "en", "src0", base.length),
      (1L, base, "en", "src1", base.length),                  // exact dup of 0
      (2L, near, "en", "src2", near.length),                  // near dup of 0/1
      (3L, "completely different text about spark query engines and " +
        "columnar execution with vectorized operators running fast", "en", "src3", 100),
      (4L, "short unrelated words", "en", "src4", 21))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val d = java.nio.file.Files.createTempDirectory("dedup_fix").toString
    docs.coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("q_exact_dedup collapses byte-identical documents, keeps lowest id") {
    val r = LlmQueries.queries("q_exact_dedup")(TestSpark.spark, dir).collect()
    assert(r.length == 4) // 5 docs, one exact-dup pair
    val dupGroup = r.find(_.getLong(2) == 2L).get
    assert(dupGroup.getLong(1) == 0L) // keep_id = min(doc_id)
    assert(r.count(_.getLong(2) == 1L) == 3)
  }

  test("q_near_dedup_minhash finds the exact AND the near pair, nothing else") {
    val r = LlmQueries.queries("q_near_dedup_minhash")(TestSpark.spark, dir)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSeq
    val pairs = r.map(p => (p._1, p._2)).toSet
    assert(pairs.contains((0L, 1L)), s"exact pair missing from $r")
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)),
      s"near pair missing from $r")
    assert(r.collectFirst { case (0L, 1L, j) => j }.get == 1.0)
    assert(pairs.forall { case (a, b) => Set(a, b).subsetOf(Set(0L, 1L, 2L)) },
      s"false positive in $r")
  }

  test("minhash pairs under a reliable checkpoint dir match the default path") {
    // Materialize switches the signature materialization from
    // localCheckpoint to a reliable df.checkpoint() when a session
    // checkpoint dir is set (the executor-loss-safe 100 TB mode) — the
    // pair results must be identical and real checkpoint files written.
    val s = TestSpark.spark
    val sc = s.sparkContext
    val want = LlmQueries.queries("q_near_dedup_minhash")(s, dir)
      .collect().toSeq
    val ckpt = java.nio.file.Files.createTempDirectory("graft_mh_ckpt").toFile
    try {
      sc.setCheckpointDir(ckpt.getAbsolutePath)
      val got = LlmQueries.queries("q_near_dedup_minhash")(s, dir)
        .collect().toSeq
      assert(got == want)
      def rddDirs(f: java.io.File): Seq[java.io.File] =
        Option(f.listFiles).toSeq.flatten.flatMap { c =>
          if (c.isDirectory && c.getName.startsWith("rdd-")) Seq(c)
          else if (c.isDirectory) rddDirs(c) else Nil
        }
      assert(rddDirs(ckpt).nonEmpty, "no reliable checkpoint data written")
    } finally {
      sc.setCheckpointDir(null)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(ckpt)
    }
  }

  test("q_ngram_jaccard blocks on the min-shingle and verifies at 0.8") {
    val r = LlmQueries.queries("q_ngram_jaccard")(TestSpark.spark, dir)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSeq
    assert(r.map(p => (p._1, p._2)).contains((0L, 1L)))
    assert(r.forall(_._3 >= 0.8))
    assert(r.forall { case (a, b, _) => Set(a, b).subsetOf(Set(0L, 1L, 2L)) })
  }

  test("containment catches a short doc embedded in a long one that " +
      "Jaccard misses") {
    val s = TestSpark.spark
    import s.implicits._
    // doc 1 is a verbatim 8-token passage inside the 24-token doc 0 —
    // every 4-gram of doc 1 appears in doc 0, so containment = 1.0,
    // while Jaccard = 5/21 ≈ 0.24 would never clear a dedup threshold.
    // doc 2 shares nothing.
    val long = "a b c d e f g h i j k l m n o p q r s t u v w x"
    val short = "e f g h i j k l"
    val docs = Seq((0L, long), (1L, short), (2L, "z1 z2 z3 z4 z5 z6 z7 z8"))
      .toDF("doc_id", "text")
    val r = LlmQueries.containmentPairs(docs, "doc_id", "text",
      n = 4, minMicro = 600000L, cap = 100).collect()
    assert(r.length == 1, r.mkString(";"))
    val row = r.head
    assert(row.getLong(0) == 0L && row.getLong(1) == 1L)
    assert(row.getLong(2) == 21L && row.getLong(3) == 5L) // sz_a, sz_b
    assert(row.getLong(4) == 5L)                          // n_common
    assert(row.getLong(5) == 1000000L)                    // full containment
    // the symmetric-Jaccard check this operator exists to beat:
    assert(5.0 / 21.0 < 0.8)
  }

  test("containment df-cap drops boilerplate grams from the declared " +
      "semantics") {
    val s = TestSpark.spark
    import s.implicits._
    // the shared gram "x y z w" appears in 3 docs; with cap = 2 it is
    // boilerplate and no pair forms at the 0.6 threshold
    val docs = Seq(
      (0L, "x y z w a1 a2 a3"),
      (1L, "x y z w b1 b2 b3"),
      (2L, "x y z w c1 c2 c3")).toDF("doc_id", "text")
    val capped = LlmQueries.containmentPairs(docs, "doc_id", "text",
      n = 4, minMicro = 100000L, cap = 2).collect()
    assert(capped.isEmpty, capped.mkString(";"))
    // with the cap open the gram witnesses all three pairs
    val open = LlmQueries.containmentPairs(docs, "doc_id", "text",
      n = 4, minMicro = 100000L, cap = 100).collect()
    assert(open.length == 3, open.mkString(";"))
  }

  test("q_simhash gives identical fingerprints to identical documents") {
    val r = LlmQueries.queries("q_simhash")(TestSpark.spark, dir)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r(0L) == r(1L))
    // near-dup differs in at most a few bits
    val hamming = java.lang.Long.bitCount(r(0L) ^ r(2L))
    assert(hamming <= 6, s"near-dup hamming distance $hamming")
    assert(java.lang.Long.bitCount(r(0L) ^ r(3L)) > hamming)
  }

  test("chunkDedup flags later copies of a shared passage, keeps first") {
    val s = TestSpark.spark
    import s.implicits._
    // docs 0 and 1 share their FIRST 4-token chunk exactly; doc 1's
    // second chunk and all of doc 2 are unique
    val docs = Seq(
      (0L, "a b c d e f g h"),
      (1L, "a b c d x y z w"),
      (2L, "p q r s t u v m")
    ).toDF("doc_id", "text")
    val r = CorpusOps.chunkDedup(docs, "doc_id", "text", window = 4)
      .orderBy($"doc_id", $"chunk_id").collect()
    assert(r.length == 6) // 2 chunks per doc
    val dup = r.filter(!_.getBoolean(3))
    assert(dup.length == 1, dup.mkString(";"))
    assert(dup.head.getLong(0) == 1L && dup.head.getLong(1) == 0L)
    // identical hash binds the kept and dropped copy
    val kept0 = r.find(x => x.getLong(0) == 0L && x.getLong(1) == 0L).get
    assert(kept0.getString(2) == dup.head.getString(2) && kept0.getBoolean(3))
  }

  test("recallAnchors is a fixed COUNT, independent of corpus size — " +
      "the audits' truth arm is K×n, never a fraction of n²") {
    val s = TestSpark.spark
    import s.implicits._
    val small = (0L until 200L).toDF("doc_id")
    val big = (0L until 4000L).toDF("doc_id")
    val aSmall = LlmQueries.recallAnchors(small, "doc_id")
      .collect().map(_.getLong(0)).toSet
    val aBig = LlmQueries.recallAnchors(big, "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(aSmall.size == LlmQueries.RecallAnchors, aSmall.size)
    // 20× the corpus, SAME anchor count — the linearity claim itself
    assert(aBig.size == LlmQueries.RecallAnchors, aBig.size)
    // deterministic: re-selection returns the identical set
    val again = LlmQueries.recallAnchors(big, "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(again == aBig)
    // a corpus smaller than K anchors everything
    val tiny = (0L until 10L).toDF("doc_id")
    assert(LlmQueries.recallAnchors(tiny, "doc_id").count() == 10L)
  }

  test("emb touching-pairs ∪ old pairs equals the full pair set under " +
      "fixed planes (incremental discovery is lossless)") {
    val s = TestSpark.spark
    val sf = "/root/testdata/sf0.001"
    val vecs = graft.Tables.embeddings(s, sf)
    val old = vecs.filter(expr("vec_id % 5 <> 4"))
    val planes = LlmQueries.derivePlanes(old, "vec_id", "embedding", 6)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_a"), col("vec_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = pairSet(LlmQueries.embPairsWithPlanes(vecs, "vec_id",
      "embedding", planes, 0.35))
    val oldPairs = pairSet(LlmQueries.embPairsWithPlanes(old, "vec_id",
      "embedding", planes, 0.35))
    val touching = pairSet(LlmQueries.embPairsWithPlanes(vecs, "vec_id",
      "embedding", planes, 0.35,
      touching = Some(vecs.filter(expr("vec_id % 5 = 4"))
        .select(col("vec_id")))))
    assert(oldPairs.union(touching) == full)
    assert(touching.forall { case (a, b) => a % 5 == 4 || b % 5 == 4 })
    assert(touching.nonEmpty, "fixture batch produced no touching pairs")
  }

  test("emb retraction ≡ recompute over survivors under the INDEX'S " +
      "planes (a deleted plane-source vector keeps its plane)") {
    val s = TestSpark.spark
    val sf = "/root/testdata/sf0.001"
    val vecs = graft.Tables.embeddings(s, sf)
    // planes fixed at index creation, over the FULL corpus — vec_id 3 is
    // both a plane source and in the takedown batch
    val planes = LlmQueries.derivePlanes(vecs, "vec_id", "embedding", 6)
    val pairs = LlmQueries.embPairsWithPlanes(vecs, "vec_id", "embedding",
      planes, 0.35).select(col("vec_a"), col("vec_b"))
    val labels = DedupClusters.clustersFromPairs(
      vecs.select(col("vec_id")), "vec_id", pairs, "vec_a", "vec_b")
      .select(col("vec_id"), col("component"))
    val retracted = DedupClusters.clustersRetract(labels, "vec_id", pairs,
      "vec_a", "vec_b",
      vecs.filter(expr("vec_id % 7 = 3")).select(col("vec_id")), "vec_id")
    val survivors = vecs.filter(expr("vec_id % 7 <> 3"))
    // the recompute twin keeps the ORIGINAL plane set (index identity)
    val recomputed = DedupClusters.clustersFromPairs(
      survivors.select(col("vec_id")), "vec_id",
      LlmQueries.embPairsWithPlanes(survivors, "vec_id", "embedding",
        planes, 0.35).select(col("vec_a"), col("vec_b")),
      "vec_a", "vec_b")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(rows(retracted) == rows(recomputed))
    assert(retracted.filter(col("vec_id") % 7 === 3).count() == 0L)
  }

  test("q_doc_fingerprint shares fingerprints exactly within the dup cluster") {
    val r = LlmQueries.queries("q_doc_fingerprint")(TestSpark.spark, dir)
      .collect().map(x => x.getLong(0) -> (x.getLong(2), x.getLong(3))).toMap
    assert(r(0L)._1 == r(1L)._1) // same content → same fingerprint
    assert(r(0L)._2 >= 2)        // n_same_fp counts the cluster
    assert(r(0L)._1 != r(3L)._1)
  }
}
