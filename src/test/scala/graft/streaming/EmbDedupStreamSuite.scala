package graft.streaming

import graft.TestSpark
import graft.api.Graft
import graft.operators.LlmQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end spec for continuous embedding-index maintenance (round-7
  * verdict #6): stream N batches through [[EmbDedupStream]] and assert
  *  (a) the final index equals the batch-built sign-sketch over exactly
  *      the ACCEPTED vectors, sketched with the PERSISTED planes,
  *  (b) the accumulated pair log equals the per-batch audit recompute
  *      (full-corpus pairs restricted to pairs touching the batch),
  *  (c) replaying a batch id (foreachBatch retry) changes nothing,
  *  (d) the plane set persists beside the index and is the first batch's
  *      lowest-id vectors.
  *
  * Fixture geometry (3-d): planes come from batch 0's vectors 1 and 2.
  * The v1-family (9, 11, 12) shares v1's bucket and verifies ≥ 0.9;
  * vector 13 lands in vector 2's BUCKET but fails cosine verification —
  * the candidate-vs-verified distinction.
  */
class EmbDedupStreamSuite extends AnyFunSuite {

  private val v1 = Array(1f, -0.1f, 0f)
  private val v2 = Array(-0.1f, 1f, 0f)
  private val batches: Seq[Seq[(Long, Array[Float])]] = Seq(
    // b0: two orthogonal-ish vectors — no pairs, both accepted, planes fixed.
    Seq((1L, v1), (2L, v2)),
    // b1: 9 ~ v1 (pair (1,9) → 9 rejected), 11 = exact twin of 9
    //     (batch×batch (9,11) and (1,11) → 11 rejected), 10 unrelated.
    Seq((9L, Array(0.99f, -0.1f, 0.01f)), (11L, Array(0.99f, -0.1f, 0.01f)),
      (10L, Array(0.1f, 0.1f, 1f))),
    // b2: 12 ~ v1 (pair (1,12) → rejected; must NOT pair with the
    //     REJECTED 9/11 — they never entered the index); 13 shares
    //     vector 2's bucket but fails verification (cos ≈ 0.2).
    Seq((12L, Array(0.98f, -0.12f, 0f)), (13L, Array(0f, 0.2f, -1f))))

  private val Threshold = 0.9

  private def collectPairs(df: DataFrame): Set[(Long, Long)] =
    df.select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("streamed sketch index == batch-built index over accepted vectors; " +
      "pair log == audit recompute; replay is a no-op; planes persist") {
    val s = TestSpark.spark
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val root = java.nio.file.Files.createTempDirectory("emb_stream").toFile
    val idx = new java.io.File(root, "index").getAbsolutePath
    val prs = new java.io.File(root, "pairs").getAbsolutePath
    val ck = new java.io.File(root, "ck").getAbsolutePath

    val stream = MemoryStream[(Long, Array[Float])]
    val vecs = stream.toDF.toDF("id", "emb")

    batches.foreach { b =>
      stream.addData(b)
      EmbDedupStream.start(vecs, "id", "emb", idx, prs, ck,
        threshold = Threshold, nPlanes = 2).awaitTermination()
    }

    // Audit recompute of the acceptance policy: full pairs over
    // accepted-so-far ∪ batch, restricted to pairs touching the batch.
    // (accepted always contains vectors 1 and 2, so the audit's derived
    // planes equal the stream's persisted ones.)
    var accepted = Seq.empty[(Long, Array[Float])]
    var wantPairs = Set.empty[(Long, Long)]
    batches.foreach { b =>
      val world = (accepted ++ b).toDF("id", "emb")
      val bIds = b.map(_._1).toSet
      val batchPairs = collectPairs(
        Graft.embNearDupPairs(world, "id", "emb", planes = 2, Threshold))
        .filter(p => bIds.contains(p._1) || bIds.contains(p._2))
      wantPairs ++= batchPairs
      val rejected = batchPairs.map(_._2)
      accepted ++= b.filterNot(d => rejected.contains(d._1))
    }
    // fixture sanity: cross-batch, within-batch, rejected-invisible, and
    // bucket-but-not-verified cases all exercised
    assert(wantPairs.contains((1L, 9L)) && wantPairs.contains((9L, 11L)))
    assert(wantPairs.contains((1L, 12L)) && !wantPairs.exists(p =>
      p == (9L, 12L) || p == (11L, 12L)))
    assert(!wantPairs.exists(p => p._1 == 13L || p._2 == 13L))
    assert(accepted.map(_._1).sorted == Seq(1L, 2L, 10L, 13L))

    // (b) the accumulated pair log
    assert(collectPairs(EmbDedupStream.readPairs(s, prs)) == wantPairs)

    // (d) planes: persisted beside the index, batch 0's lowest ids
    val planes = EmbDedupStream.readPlanes(s, idx)
    val planeRows = planes.orderBy("pid").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toVector))
    assert(planeRows.toSeq ==
      Seq((0, v1.toVector), (1, v2.toVector)))

    // (a) the final index: identical rows to the batch-built sign-sketch
    // over the accepted vectors under the persisted planes
    def indexRows(df: DataFrame) = df
      .select(col("vec_id"), col("sketch"), col("norm"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = indexRows(EmbDedupStream.readIndex(s, idx))
    val want = indexRows(LlmQueries.signSketch(
      accepted.toDF("id", "emb"), "id", "emb", planes))
    assert(got == want && got.map(_._1) == Set(1L, 2L, 10L, 13L))

    // the index lays out as sketch-prefix partitions — the probe's
    // partition-pruned read path depends on this shape
    val batchDir = new java.io.File(idx, "batch=0")
    assert(batchDir.exists &&
      batchDir.listFiles().exists(_.getName.startsWith("sb=")))

    // (c) replaying the LAST batch id (a foreachBatch retry) is a no-op
    EmbDedupStream.processBatch(batches.last.toDF("id", "emb"), 2L,
      "id", "emb", idx, prs, threshold = Threshold, nPlanes = 2)
    assert(collectPairs(EmbDedupStream.readPairs(s, prs)) == wantPairs)
    assert(indexRows(EmbDedupStream.readIndex(s, idx)) == got)

    // re-ingesting an already-accepted id pairs it against the corpus but
    // appends no duplicate index rows (first-write-wins)
    EmbDedupStream.processBatch(Seq((2L, v2)).toDF("id", "emb"), 3L,
      "id", "emb", idx, prs, threshold = Threshold, nPlanes = 2)
    assert(indexRows(EmbDedupStream.readIndex(s, idx)) == got)
    val perVec = EmbDedupStream.readIndex(s, idx)
      .groupBy("vec_id").count().collect().map(_.getLong(1)).toSet
    assert(perVec == Set(1L)) // exactly one row per indexed vector

    // plan pin: the first-write-wins membership read is the IdSidecar's
    // ib-pruned point lookup, never an O(index) vec_id scan
    val ib1 = Seq(1L).toDF("x")
      .select(IdSidecar.bucket(col("x"), IdSidecar.Buckets)).head.getInt(0)
    val sidecar = IdSidecar.read(s, idx, Seq(ib1), 4L)
    val ps = sidecar.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*ib#[^\\]]*\\]".r.findFirstIn(ps).isDefined,
      ps.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
    assert(sidecar.filter(col("vec_id") === 1L).count() == 1L)
    // the sidecar membership matches the index exactly (accepted only)
    assert(TestSpark.spark.read.parquet(IdSidecar.root(idx))
      .select("vec_id").collect().map(_.getLong(0)).toSet == got.map(_._1))
  }
}
