package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The two properties a Bloom prefilter lives or dies by: it NEVER drops
  * a true match (result transparency ahead of the exact join), and it
  * drops MOST non-matching rows (or it bought nothing). */
class BloomJoinSuite extends AnyFunSuite {

  test("bloom prune keeps every true match and most non-matches drop") {
    val s = TestSpark.spark
    import s.implicits._
    val build = (0L until 50L).map(i => i * 7L).toDF("k") // keys 0,7,...,343
    val probe = (0L until 20000L).toDF("x")               // 0..19999
    val kept = BloomJoin.bloomPrune(probe, "x", build, "k")
      .select("x").as[Long].collect().toSet
    val truth = (0L until 50L).map(_ * 7L).filter(_ < 20000L).toSet
    // No false negatives — every real key survives the filter.
    assert((truth -- kept).isEmpty, s"lost: ${truth -- kept}")
    // False-positive rate: k=3 hashes, m=65536 bits, n=50 keys inserted
    // → (1-e^(-kn/m))^k ≈ 1e-7; on 20k probes even 100× that expectation
    // stays far under 1% — anything more means the bitmap is broken.
    val fp = kept -- truth
    assert(fp.size < 200, s"false-positive rate too high: ${fp.size}/20000")
  }

  test("cluster representatives: rep is the longest member, ties to min id") {
    val s = TestSpark.spark
    import s.implicits._
    // Three exact-duplicate docs (one cluster) with distinct lengths via
    // n_chars, plus a singleton. MinHash at threshold 0.7 links the
    // identical texts; rep must be the longest (doc 12), not min id (10).
    val text = (0 until 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (10L, text, 100L), (11L, text, 250L), (12L, text, 900L),
      (20L, (0 until 40).map(i => s"zzz$i").mkString(" "), 50L))
      .toDF("doc_id", "text", "n_chars")
    val out = DedupClusters
      .clusterRepresentatives(docs, "doc_id", "text", "n_chars", 0.7)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4), r.getBoolean(5))))
      .toMap
    assert(out(10L) == ((10L, 3L, 12L, false)))
    assert(out(11L) == ((10L, 3L, 12L, false)))
    assert(out(12L) == ((10L, 3L, 12L, true)))
    assert(out(20L) == ((20L, 1L, 20L, true)))
  }
}
