package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** BPE training semantics on corpora small enough to run by hand:
  * frequency-weighted pair selection, the deterministic tie order, the
  * single-pass merge application, and early stop when the histogram
  * runs dry. */
class BpeTrainSuite extends AnyFunSuite {

  private def train(texts: Seq[String], rounds: Int) = {
    val s = TestSpark.spark
    import s.implicits._
    CorpusOps.bpeTrain(texts.toDF("text"), "text", rounds)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
      .toSeq
  }

  test("merges are learned by weighted frequency and applied before the " +
      "next round; training stops when no pairs remain") {
    // words: aa x3, ab x1, b x1
    // round 0: (a,a)=3 beats (a,b)=1 -> merge aa; round 1: (a,b)=1;
    // round 2: every word is a single symbol -> dry stop at 2 merges.
    val got = train(Seq("aa aa ab", "aa b"), rounds = 8)
    assert(got == Seq(
      (0, "a", "a", "aa", 3L),
      (1, "a", "b", "ab", 1L)))
  }

  test("ties break on the (a, b) total order") {
    // (a,b)=2 and (c,d)=2 tie in round 0 -> 'a' < 'c' wins first.
    val got = train(Seq("ab cd", "ab cd"), rounds = 2)
    assert(got == Seq(
      (0, "a", "b", "ab", 2L),
      (1, "c", "d", "cd", 2L)))
  }

  test("pair counting is adjacent-overlapping, application is the " +
      "kernel's single left-to-right pass") {
    // 'aaa': round 0 counts (a,a) twice but the merge yields [aa, a] —
    // so round 1 sees (aa, a) once, not (a, a) again inside the merge.
    val got = train(Seq("aaa"), rounds = 2)
    assert(got == Seq(
      (0, "a", "a", "aa", 2L),
      (1, "aa", "a", "aaa", 1L)))
  }

  test("learned merges over the driver corpus are well-formed: every " +
      "pair part is a single character or an earlier merge output") {
    val s = TestSpark.spark
    val rows = CorpusOps.bpeTrain(
      graft.Tables.documents(s, "/root/testdata/sf0.001"), "text")
      .collect()
    assert(rows.length > 0)
    val outputs = scala.collection.mutable.Set.empty[String]
    rows.foreach { r =>
      val (a, b, merged) = (r.getString(1), r.getString(2), r.getString(3))
      assert(a.length == 1 || outputs.contains(a), s"ill-formed left: $a")
      assert(b.length == 1 || outputs.contains(b), s"ill-formed right: $b")
      assert(merged == a + b)
      outputs += merged
    }
    // counts are positive and ranks are contiguous from 0
    assert(rows.map(_.getInt(0)).toSeq == rows.indices.toSeq)
    assert(rows.forall(_.getLong(4) > 0))
  }
}
