package graft.streaming

import graft.TestSpark
import graft.api.Graft
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end spec for continuous ANN-index maintenance: stream batches
  * through [[VectorIndexStream]] and assert
  *  (a) the accumulated index equals the batch ivfAssign over ALL
  *      vectors under the persisted (first-batch-trained) centroids,
  *  (b) probeVectorIndex over the streamed layout equals ivfProbe over
  *      the in-memory assignment (and prunes partitions),
  *  (c) replaying a batch id is a no-op,
  *  (d) later batches assign against the STORED centroids — the
  *      codebook never retrains under the index. */
class VectorIndexStreamSuite extends AnyFunSuite {

  // two tight cosine groups; batch 0 holds one vector of each, so the
  // trained codebook (k = 2) lands one centroid per group
  private val batches: Seq[Seq[(Long, Array[Float])]] = Seq(
    Seq((1L, Array(1f, 0.05f)), (2L, Array(0.05f, 1f))),
    Seq((3L, Array(0.98f, 0.02f)), (4L, Array(0.02f, 0.97f))),
    Seq((5L, Array(0.99f, 0f)), (6L, Array(0f, 1.01f))))

  test("streamed index == batch assignment under the persisted codebook; " +
      "probe parity + pruning; replay is a no-op") {
    val s = TestSpark.spark
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val root = java.nio.file.Files.createTempDirectory("vidx_stream").toFile
    val idx = new java.io.File(root, "index").getAbsolutePath
    val ck = new java.io.File(root, "ck").getAbsolutePath

    val stream = MemoryStream[(Long, Array[Float])]
    val vecs = stream.toDF.toDF("vid", "emb")
    batches.foreach { b =>
      stream.addData(b)
      VectorIndexStream.start(vecs, "vid", "emb", idx, ck, k = 2)
        .awaitTermination()
    }

    // (d)+(a): the codebook is batch 0's training; the index must equal
    // assigning ALL vectors against those stored centroids
    val cents = VectorIndexStream.readCentroids(s, idx)
    assert(cents.count() == 2)
    val all = batches.flatten.toDF("vid", "emb")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vid"), col("cluster").cast("long")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows(VectorIndexStream.readIndex(s, idx))
    val want = rows(Graft.ivfAssign(all, "vid", "emb", cents, "cid", "cv"))
    assert(got == want && got.size == 6)
    // groups land in distinct buckets
    val byCluster = got.groupBy(_._2).map { case (c, xs) => c -> xs.map(_._1) }
    assert(byCluster.values.toSet == Set(Set(1L, 3L, 5L), Set(2L, 4L, 6L)))

    // (b) probe over the streamed layout == in-memory probe; pruned scan
    val queries = all.filter($"vid" === 1L).withColumnRenamed("vid", "qid")
    val probe = Graft.probeVectorIndex(s, idx, "vid", "emb", queries, "qid", k = 3)
    val gotProbe = probe.collect().map(r => (r.getInt(1), r.getLong(2))).toSeq
    val assigned = Graft.ivfAssign(all, "vid", "emb", cents, "cid", "cv")
    val wantProbe = Graft.ivfProbe(assigned, "vid", "emb",
        Graft.ivfAssign(queries, "qid", "emb", cents, "cid", "cv")
          .selectExpr("qid", "emb", "cluster"), "qid", k = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSeq
    assert(gotProbe == wantProbe && gotProbe.map(_._2).toSet == Set(1L, 3L, 5L))
    val plan = probe.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cluster[^\\]]*\\]".r
      .findFirstIn(plan).isDefined, plan.linesIterator.take(12).mkString("\n"))

    // (c) replaying the LAST batch id changes nothing
    VectorIndexStream.processBatch(batches.last.toDF("vid", "emb"), 2L,
      "vid", "emb", idx, k = 2)
    assert(rows(VectorIndexStream.readIndex(s, idx)) == got)
  }

  test("pqM > 0 maintains the PQ serving layout: codes frozen to the " +
      "first batch's codebook, stream == batch encode, ADC probe works") {
    val s = TestSpark.spark
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val root = java.nio.file.Files.createTempDirectory("vidx_pq").toFile
    val idx = new java.io.File(root, "index").getAbsolutePath
    val ck = new java.io.File(root, "ck").getAbsolutePath

    val stream = MemoryStream[(Long, Array[Float])]
    val vecs = stream.toDF.toDF("vid", "emb")
    batches.foreach { b =>
      stream.addData(b)
      VectorIndexStream.start(vecs, "vid", "emb", idx, ck, k = 2,
        pqM = 2, pqK = 4).awaitTermination()
    }

    // the streamed rows carry norm + codes, and the codes equal a batch
    // re-encode of ALL vectors against the STORED (frozen) centroid and
    // codebook tables — i.e. a vector's codes don't depend on arrival time
    import graft.operators.PersistedVectorIndex
    val cents = VectorIndexStream.readCentroids(s, idx)
    val cbkRows = s.read.parquet(s"$idx/_graft_pq_codebook")
    // codebook froze on batch 0's ids (< pqK): vids 1 and 2, 2 subspaces
    assert(cbkRows.select("c").distinct().collect().map(_.getInt(0)).toSet
      == Set(1, 2))
    val all = batches.flatten.toDF("vid", "emb")
    val centsInt = cents.selectExpr("cid AS ccid",
      "transform(cv, x -> cast(round(cast(x AS double) * 1000000.0) AS bigint)) AS cq")
    val withRes = PersistedVectorIndex.withResiduals(
      Graft.ivfAssign(all, "vid", "emb", cents, "cid", "cv")
        .withColumn("norm", expr("sqrt(dot_f32(emb, emb))")),
      "emb", centsInt)
    def codes(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vid"), col("code0"), col("code1")).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val want = codes(PersistedVectorIndex.encodeWithCodebook(
      withRes, cbkRows, m = 2, sub = 1))
    val got = codes(VectorIndexStream.readIndex(s, idx))
    assert(got == want && got.size == 6)

    // the streamed layout serves ADC probes directly
    val queries = all.filter($"vid" === 1L).withColumnRenamed("vid", "qid")
    val probe = Graft.probePqIndex(s, idx, "vid", "emb", queries, "qid",
      topK = 3, shortList = 100)
    val gotProbe = probe.collect().map(r => (r.getInt(1), r.getLong(2))).toSeq
    assert(gotProbe.head == ((1, 1L)), s"query must rank itself first: $gotProbe")
    assert(gotProbe.map(_._2).toSet == Set(1L, 3L, 5L)) // its own bucket
  }
}
