package graft.operators

import graft.TestSpark
import graft.api.Graft
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the r10 curation additions where the driver oracle cannot
  * reach: PSI's partitioning-independence and smoothing contract, and the
  * cross-modal pairing/threshold edge cases.
  */
class CrossmodalDriftSuite extends AnyFunSuite {
  private val s = TestSpark.spark
  import s.implicits._

  // ---------------------------------------------------------------- drift

  test("driftPsi: a segment distributed like the corpus scores ~0; a " +
      "concentrated segment scores high") {
    // seg "flat" spreads uniformly over buckets 0-3 and dominates the
    // corpus (so the global reference ~= flat); the small seg "spike"
    // puts everything in bucket 0.
    val rows = ((0 until 400).map(i => ("flat", (i % 4).toLong)) ++
      (0 until 10).map(_ => ("spike", 0L))).toDF("seg", "b")
    val got = Graft.driftPsi(rows, "seg", "b", nBuckets = 4)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(got("flat") < 0.05, s"flat segment drifted: ${got("flat")}")
    assert(got("spike") > 0.25, s"spike segment stable: ${got("spike")}")
  }

  test("driftPsi is partitioning-independent (nano-nat integer sums)") {
    val base = (0 until 1000)
      .map(i => (s"seg${i % 3}", (i % 7 % 5).toLong)).toDF("seg", "b")
    val a = Graft.driftPsi(base.repartition(1), "seg", "b", 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val b = Graft.driftPsi(base.repartition(13, col("b")), "seg", "b", 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
  }

  test("driftPsi: empty buckets are Laplace-smoothed, never NaN/Inf, " +
      "and psi is always >= 0") {
    // seg "hole" never hits buckets 2-9; smoothing must keep every ln
    // argument finite and positive.
    val rows = ((0 until 50).map(i => ("hole", (i % 2).toLong)) ++
      (0 until 50).map(i => ("full", (i % 10).toLong))).toDF("seg", "b")
    val got = Graft.driftPsi(rows, "seg", "b", 10)
      .collect().map(r => r.getDouble(2))
    assert(got.forall(p => !p.isNaN && !p.isInfinite && p >= 0.0), got.toSeq)
  }

  // ------------------------------------------------------------ crossmodal

  test("crossmodalPairs pairs modalities by id div 2 and drops items " +
      "missing one side") {
    val vecs = Seq(
      (0L, Array(1f, 0f), 10), (1L, Array(1f, 0f), 11),   // item 0: aligned
      (2L, Array(0f, 1f), 20), (3L, Array(1f, 0f), 21),   // item 1: orthogonal
      (4L, Array(1f, 1f), 30)                             // item 2: image only
    ).toDF("vec_id", "embedding", "label")
    val pairs = Graft.crossmodalPairs(vecs, "vec_id", "embedding", "label")
    val got = pairs.collect().map(r => r.getLong(0)).toSet
    assert(got == Set(0L, 1L), got) // item 2 dropped
    val labels = pairs.filter(col("item_id") === 0)
      .select("img_label", "txt_label").collect().head
    assert((labels.getInt(0), labels.getInt(1)) == (10, 11))
  }

  test("cosineAlignFilter keeps pairs at/above threshold with the exact " +
      "rounded cosine") {
    val vecs = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(1f, 0f), 0),     // cos = 1.0
      (2L, Array(0f, 1f), 0), (3L, Array(1f, 0f), 0),     // cos = 0.0
      (6L, Array(1f, 0f), 0), (7L, Array(1f, 1f), 0)      // cos = rounded sqrt(2)/2
    ).toDF("vec_id", "embedding", "label")
    val pairs = Graft.crossmodalPairs(vecs, "vec_id", "embedding", "label")
    val kept = Graft.cosineAlignFilter(pairs, "iv", "tv", threshold = 0.5)
      .select("item_id", "clip_score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(kept.keySet == Set(0L, 3L), kept)
    assert(kept(0L) == 1.0)
    assert(kept(3L) == 0.707107) // round(1/sqrt(2), 6)
    // threshold boundary is inclusive on the ROUNDED score
    val boundary = Graft.cosineAlignFilter(pairs, "iv", "tv", 0.707107)
    assert(boundary.filter(col("item_id") === 3).count() == 1)
  }
}
