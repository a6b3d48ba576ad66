package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Hand-computable fixtures for the corpus-statistics signals: PMI on a
  * corpus with one engineered collocation, coverage against exact
  * cumulative counts, and entropy against closed-form values. */
class TextSignalsSuite extends AnyFunSuite with Matchers {

  test("pmi: an always-together pair outranks an independent pair") {
    val s = TestSpark.spark
    import s.implicits._
    // "san francisco" always co-occurs (5 times, never apart);
    // "the cat"/"the dog" mix freely so "the *" has low PMI.
    val docs = (
      Seq.fill(5)("san francisco is great") ++
        Seq.fill(5)("the cat sat") ++ Seq.fill(5)("the dog sat"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = TextSignals.pmiTop(docs, "text", 5, 20).collect()
    val pairs = out.map(r => (r.getString(0), r.getString(1))) // w1, w2
    // N = 35 bigrams. The san-francisco sentence's three bigrams all have
    // 5/5/5 marginals → pmi = ln(5·35/25) = ln 7, and outrank every
    // "the/sat" bigram (a 10 in one marginal → ln 3.5); within the tie
    // the order is (w1, w2) lexicographic.
    assert(pairs.take(3).toList == List(("francisco", "is"),
      ("is", "great"), ("san", "francisco")))
    val pmi = out.map(r =>
      ((r.getString(0), r.getString(1)), r.getLong(5))).toMap
    assert(pmi(("san", "francisco")) == math.round(math.log(7.0) * 1e6))
    assert(pmi(("the", "cat")) == math.round(math.log(3.5) * 1e6))
  }

  test("vocab coverage: exact cumulative counts at each K, ties by token") {
    val s = TestSpark.spark
    import s.implicits._
    // freq: a=6, b=3, c=3, d=1 → top-10 covers everything; ordering of
    // the b/c tie is alphabetical and coverage at K is cumulative.
    val docs = Seq((1L, "a a a b b c"), (2L, "a a a b c c d"))
      .toDF("doc_id", "text")
    val out = TextSignals.vocabCoverage(docs, "text", Seq(1, 2, 10))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toList
    assert(out == List(
      (1, 1L, 6L, 13L, 6L * 1000000 / 13),
      (2, 2L, 9L, 13L, 9L * 1000000 / 13),
      (10, 4L, 13L, 13L, 1000000L)))
  }

  test("dsir: target-exclusive docs score 0, corpus-only docs score " +
      "the closed-form negative ratio") {
    val s = TestSpark.spark
    import s.implicits._
    // target = en. The en bigram "a b" has target counts == corpus counts
    // (c12=2=c12_t, c1=2=c1_t) → identical smoothed log-probs → weight 0.
    // The de bigram "c d": target lp = ln((0+1)/(0+4)), corpus
    // lp = ln((2+1)/(2+4)) → term = ln(1/4) − ln(1/2) = ln(1/2).
    val docs = Seq(
      (0L, "a b", "en"), (1L, "a b", "en"),
      (2L, "c d", "de"), (3L, "c d", "de"))
      .toDF("doc_id", "text", "lang")
    val out = TextSignals.dsirWeights(docs, "doc_id", "text", "lang = 'en'")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(0L) == ((1L, 0.0)))
    val expected = (math.round(math.log(0.25) * 1e6) -
      math.round(math.log(0.5) * 1e6)) / 1e6
    assert(out(2L)._2 == BigDecimal(expected)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // directional: target-like above corpus-only
    assert(out(0L)._2 > out(2L)._2)
  }

  test("entropy: closed forms for degenerate, uniform, and mixed docs") {
    val s = TestSpark.spark
    import s.implicits._
    val docs = Seq(
      (1L, "x x x x"),      // degenerate: H = 0
      (2L, "a b c d"),      // uniform over 4: H = ln 4
      (3L, "a a b"))        // H = (2·ln(3/2) + 1·ln 3) / 3
      .toDF("doc_id", "text")
    val out = TextSignals.tokenEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((4L, 1L, 0L)))
    val h4 = math.round(4 * math.log(4.0) * 1e6) / 4
    assert(out(2L) == ((4L, 4L, h4)))
    val h3 = (math.round(2 * math.log(1.5) * 1e6) +
      math.round(math.log(3.0) * 1e6)) / 3
    assert(out(3L) == ((3L, 2L, h3)))
  }
}
