package graft.operators

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Takedown semantics for the persisted ANN serving index
  * (`q_ann_retract`): the retracted generation must be EXACTLY the base
  * postings minus the deleted batch — same clusters, same codes, same
  * vocabularies — and the deletion must be visible in what the funnel
  * serves. */
class VectorIndexRetractSuite extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  test("retracted generation = base postings minus the batch; survivor " +
      "rows and vocabularies byte-identical (no re-encode, no retrain)") {
    val s = TestSpark.spark
    val base = PersistedVectorIndex.ensure(s, sf)
    val dir = PersistedVectorIndex.ensureRetracted(s, sf)
    val cols = s.read.parquet(base).columns.sorted.map(col).toSeq
    val b = s.read.parquet(base).select(cols: _*)
    val r = s.read.parquet(dir).select(cols: _*)
    assert(r.filter(expr("vec_id % 7 = 1")).count() == 0L)
    val survivors = b.filter(expr("vec_id % 7 <> 1"))
    assert(r.exceptAll(survivors).isEmpty && survivors.exceptAll(r).isEmpty,
      "retracted postings != base survivors")
    for (meta <- Seq("_graft_centroids", "_graft_pq_codebook")) {
      val mb = s.read.parquet(s"$base/$meta")
      val mr = s.read.parquet(s"$dir/$meta")
      assert(mr.exceptAll(mb).isEmpty && mb.exceptAll(mr).isEmpty,
        s"$meta changed across the takedown — vocabularies must be copied")
    }
  }

  test("the takedown BITES: the deleted stored query row disappears and " +
      "deleted ids never appear in any served result") {
    val out = SparkEntry.queries("q_ann_retract")(TestSpark.spark, sf)
      .collect()
    // vec_id = 1 (≡ 1 mod 7) was one of the funnel's three query rows —
    // a deleted vector can never be a stored query row
    assert(out.map(_.getLong(0)).toSet == Set(0L, 2L), out.mkString(", "))
    assert(out.forall(_.getLong(2) % 7 != 1), out.mkString(", "))
  }
}
