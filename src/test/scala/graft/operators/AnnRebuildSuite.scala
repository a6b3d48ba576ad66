package graft.operators

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Rebuild semantics for the persisted ANN serving index
  * (`q_ann_rebuild`, r18 — the lifecycle's retrain-and-swap verb): the
  * rebuilt generation must be EXACTLY a from-scratch build over the
  * survivor corpus (one `buildFrom` code path — layout-identical, not
  * merely funnel-equivalent), the retraining must actually happen (new
  * vocabularies, not copies), and the marker-last swap discipline must
  * make a half-written generation invisible: probes only ever see a
  * generation whose marker exists, and `ensureRebuilt` REPAIRS a
  * crashed swap instead of serving its debris. */
class AnnRebuildSuite extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  private def sameFrame(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame, what: String): Unit = {
    val cols = a.columns.sorted.map(col).toSeq
    val (x, y) = (a.select(cols: _*), b.select(cols: _*))
    assert(x.exceptAll(y).isEmpty && y.exceptAll(x).isEmpty,
      s"$what differs between rebuild and from-scratch build")
  }

  test("rebuild == from-scratch build on the survivor corpus: postings, " +
      "codebook and centroids layout-identical") {
    val s = TestSpark.spark
    val rebuilt = PersistedVectorIndex.ensureRebuilt(s, sf)
    val scratch = java.nio.file.Files
      .createTempDirectory("graft_rebuild_scratch").toString
    PersistedVectorIndex.buildFrom(s,
      graft.Tables.embeddings(s, sf).filter(expr("vec_id % 7 <> 1")),
      scratch)
    sameFrame(s.read.parquet(rebuilt), s.read.parquet(scratch), "postings")
    for (meta <- Seq("_graft_centroids", "_graft_pq_codebook"))
      sameFrame(s.read.parquet(s"$rebuilt/$meta"),
        s.read.parquet(s"$scratch/$meta"), meta)
  }

  test("the rebuild RETRAINS: the new generation's vocabularies are not " +
      "the takedown generation's copies") {
    val s = TestSpark.spark
    val retracted = PersistedVectorIndex.ensureRetracted(s, sf)
    val rebuilt = PersistedVectorIndex.ensureRebuilt(s, sf)
    // The takedown froze the FULL corpus's vocabularies; retraining on
    // survivors must move at least one centroid (the deleted rows'
    // mass is gone from every mean). Codebook identity is possible in
    // principle but centroid identity is not: vec_id = 1 was a seed.
    val cb = s.read.parquet(s"$retracted/_graft_centroids")
    val cr = s.read.parquet(s"$rebuilt/_graft_centroids")
    assert(cr.exceptAll(cb).count() > 0L,
      "rebuilt centroids are byte-identical to the takedown's — no retrain happened")
  }

  test("a half-swapped generation is never served: marker absent => " +
      "ensureRebuilt repairs in place and the funnel result is unchanged") {
    val s = TestSpark.spark
    val clean = SparkEntry.queries("q_ann_rebuild")(s, sf).collect()
    assert(clean.nonEmpty)
    val dir = PersistedVectorIndex.ensureRebuilt(s, sf)
    // simulate a crash mid-swap: data present, codebook gone, marker
    // (the swap itself) never written
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(dir, "_graft_pq_codebook"))
    new java.io.File(dir, "_GRAFT_BUILT_v3").delete(): Unit
    // the resolver must NOT treat the debris as a generation: the next
    // ensure rebuilds from the takedown generation and re-swaps
    val repaired = PersistedVectorIndex.ensureRebuilt(s, sf)
    assert(repaired == dir)
    assert(new java.io.File(dir, "_GRAFT_BUILT_v3").exists())
    val again = SparkEntry.queries("q_ann_rebuild")(s, sf).collect()
    assert(again.toSeq == clean.toSeq,
      "served funnel changed across a crash-and-repair cycle")
  }
}
