package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** [[BpeCount]] vs the CLASSIC BPE encoder (repeatedly apply the
  * lowest-rank pair present, exhaustively, until none applies): the
  * kernel runs one left-to-right pass per rank, which is equivalent
  * ONLY because the merge table is well-formed — this suite pins both
  * the equivalence on random words and the well-formedness invariant
  * itself, so a future merge-table edit can't silently break the
  * single-pass shortcut (and with it the replace-chain oracle). */
class BpeCountSuite extends AnyFunSuite {
  private def count(s: String): Long = BpeCount.compute(UTF8String.fromString(s))

  /** Classic exhaustive encode of one word: lowest-rank pair present,
    * merge its leftmost occurrence, repeat from scratch. */
  private def classicWord(word: String): Int = {
    var syms = word.map(_.toString).toVector
    var done = false
    while (!done) {
      val hit = BpeCount.Merges.zipWithIndex.flatMap { case ((a, b), r) =>
        val i = syms.indices.dropRight(1)
          .find(i => syms(i) == a && syms(i + 1) == b)
        i.map(r -> _)
      }.sortBy(_._1).headOption
      hit match {
        case Some((r, i)) =>
          val (a, b) = BpeCount.Merges(r)
          syms = syms.take(i) ++ Vector(a + b) ++ syms.drop(i + 2)
        case None => done = true
      }
    }
    syms.length
  }

  private def classic(text: String): Long =
    text.split(" ", -1).filter(_.nonEmpty).map(classicWord(_).toLong).sum

  test("merge table is well-formed: every input is a single char or an " +
      "earlier output") {
    val outputs = scala.collection.mutable.Set.empty[String]
    BpeCount.Merges.foreach { case (a, b) =>
      assert(a.length == 1 || outputs.contains(a), s"left input $a")
      assert(b.length == 1 || outputs.contains(b), s"right input $b")
      outputs += (a + b)
    }
  }

  test("hand-checked words") {
    assert(count("the") == 1)          // t h e -> th e -> the
    assert(count("there") == 2)        // -> the + re
    assert(count("and") == 1)          // a n -> an; an d -> and
    assert(count("standing") == 3)     // st an d in g -> st and ing
    assert(count("zzz") == 3)          // no merges apply
    assert(count("") == 0)
    assert(count("a  b") == 2)         // consecutive spaces add nothing
    assert(count("the and the") == 3)
  }

  test("single-pass-per-rank equals classic exhaustive BPE on random words") {
    val rnd = new scala.util.Random(7)
    val alpha = "thersoinagdulb xz"
    for (trial <- 0 until 300) {
      val text = Seq.fill(1 + rnd.nextInt(6))(
        Seq.fill(1 + rnd.nextInt(12))(alpha(rnd.nextInt(alpha.length)))
          .mkString.trim).mkString(" ")
      assert(count(text) == classic(text), s"trial $trial text='$text'")
    }
  }

  test("non-BMP code points count as single symbols") {
    // U+1F600 is two UTF-16 chars but one symbol
    assert(count("😀") == 1)
    assert(count("a😀b") == 3)
  }
}
