package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Depth spec for the log-structured union-find (r14 verdict #5): the
  * gated queries drive 4 micro-batches, so the pointer-doubling closure
  * and the compaction fold had only been exercised over toy log
  * lengths. This suite drives 64 batches whose merges build a 63-link
  * LINEAR alias chain — the worst case for resolution — and pins:
  *
  *  - stream ≡ recompute at 64 batches (every chained id resolves to
  *    the chain's min; the per-batch singletons stay themselves);
  *  - closure depth is LOGARITHMIC in the chain: ceil(log2(63)) = 6
  *    hop rounds + 1 terminal no-hop round — a linear-time chase would
  *    need 63;
  *  - compaction folds 63 delta partials, leaves labels identical,
  *    collapses the closure to ≤ 1 round (only the retained newest
  *    alias partial remains), is idempotent on a second run, and
  *    maintenance continues over the folded state.
  */
class LabelLogDepthSuite extends AnyFunSuite {

  test("64 batches / 63-link alias chain: log-depth closure, " +
      "stream ≡ recompute, compaction fold + continue") {
    val s = TestSpark.spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("label_depth").toString

    // batch 0: 64 singleton seeds (the future chain members)
    LabelLog.advance(s, root, 0L, (1L to 64L).toDF("id"),
      Seq.empty[(Long, Long)].toDF("e1", "e2"))
    // batches 1..63: ingest one fresh singleton AND merge the two
    // largest still-unmerged chain comps — batch k writes alias
    // (65-k → 64-k), building the linear chain 64→63→…→1
    (1 to 63).foreach { k =>
      LabelLog.advance(s, root, k.toLong, Seq(100L + k).toDF("id"),
        Seq((65L - k, 64L - k)).toDF("e1", "e2"))
    }

    def labels(): Map[Long, (Long, Long, Boolean)] =
      LabelLog.serve(s, root, "doc_id").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getBoolean(3)))).toMap
    val want: Map[Long, (Long, Long, Boolean)] =
      (1L to 64L).map(i => i -> ((1L, 64L, i == 1L))).toMap ++
        (101L to 163L).map(i => i -> ((i, 1L, true))).toMap

    val before = labels()
    assert(before == want)

    // the 63-link chain closes in ceil(log2(63)) = 6 hop rounds + 1
    // terminal round — pinned, with slack for the empty-log edge only
    val rounds = LabelLog.closureRounds(s, root)
    assert(rounds == 7, s"expected 6 hop + 1 terminal rounds, got $rounds")

    // compaction folds all but the newest delta partial, applies the
    // closure, clears folded aliases — labels identical, closure now ≤ 1
    assert(LabelLog.compactState(s, root) == 63)
    assert(labels() == want)
    assert(LabelLog.closureRounds(s, root) <= 1)

    // idempotent: a second fold changes nothing observable
    LabelLog.compactState(s, root): Unit
    assert(labels() == want)

    // maintenance continues over the folded state: merge two of the
    // post-compaction singletons and re-serve
    LabelLog.advance(s, root, 64L, Seq.empty[Long].toDF("id"),
      Seq((102L, 101L)).toDF("e1", "e2"))
    val after = labels()
    assert(after(102L) == ((101L, 2L, false)) &&
      after(101L) == ((101L, 2L, true)), after.filterKeys(_ > 100).toMap)
    assert(after(64L) == ((1L, 64L, false)))
  }
}
