package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The native token-hash kernels must be bit-identical to the interpreted
  * compositions they replaced — the same compositions the DuckDB oracles
  * replicate, so equality here is what keeps the oracles valid. */
class TextHashSuite extends AnyFunSuite {
  private val s = TestSpark.spark
  import s.implicits._

  private val h60Comp =
    "transform(a, t -> cast(conv(substring(md5(t), 1, 15), 16, 10) AS bigint))"

  test("h60_array equals the conv(substring(md5)) composition") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 300).map { _ =>
      Tuple1(Array.fill(1 + rnd.nextInt(30))(rnd.alphanumeric.take(rnd.nextInt(12)).mkString))
    }
    val bad = rows.toDF("a")
      .selectExpr(s"h60_array(a) AS fast", s"$h60Comp AS ref")
      .filter("fast <> ref").count()
    assert(bad == 0)
  }

  test("h60_array: null elements stay null, empty array stays empty") {
    val r = s.sql(
      "SELECT h60_array(array('x', cast(NULL AS string))) AS a, " +
        "h60_array(cast(array() AS array<string>)) AS e").head()
    val a = r.getSeq[Any](0)
    assert(a.length == 2 && a(0) != null && a(1) == null)
    assert(r.getSeq[Any](1).isEmpty)
  }

  test("shingle_h60 / shingle_h60p equal the composed shingling pipeline") {
    val rnd = new scala.util.Random(17)
    val planted = Seq(
      "", "a", "a b", "a b c", "a b c d e",
      "a  b", " leading", "trailing ", "dup dup dup dup",
      "unicode héllo wörld ünïts ünïts héllo again",
      (1 to 30).map(i => s"tok${i % 7}").mkString(" "))
    val fuzz = (0 until 200).map(_ =>
      Seq.fill(rnd.nextInt(20))(rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString)
        .mkString(" "))
    val df = (planted ++ fuzz).toDF("t")
    for (n <- Seq(3, 4, 13)) {
      val composed =
        s"""sort_array(array_distinct(h60_array(
           |  array_distinct(transform(sequence(1, greatest(size(split(t, ' ')) - ${n - 1}, 1)),
           |    i -> array_join(slice(split(t, ' '), i, $n), ' ')))))) AS ref""".stripMargin
      val bad = df.selectExpr(s"sort_array(shingle_h60(t, $n)) AS fast", composed)
        .filter("fast <> ref").count()
      assert(bad == 0, s"n=$n")
    }
    val P = MinHashFamily.P
    val composedP =
      s"""sort_array(array_distinct(transform(h60_array(
         |  array_distinct(transform(sequence(1, greatest(size(split(t, ' ')) - 2, 1)),
         |    i -> array_join(slice(split(t, ' '), i, 3), ' ')))), h -> h % $P))) AS ref""".stripMargin
    val badP = df.selectExpr("sort_array(shingle_h60p(t, 3)) AS fast", composedP)
      .filter("fast <> ref").count()
    assert(badP == 0)
  }

  test("shingle_h60: null text yields null, empty text one clipped shingle") {
    val r = s.sql(
      "SELECT shingle_h60(cast(NULL AS string), 3) AS a, shingle_h60('', 3) AS b").head()
    assert(r.isNullAt(0))
    assert(r.getSeq[Long](1).length == 1) // split('') = [''] → one shingle
  }

  test("shingle_h60 rejects a non-constant or non-positive n") {
    assertThrows[Exception](s.sql("SELECT shingle_h60('a b c', 0)").head())
    assertThrows[Exception](
      s.sql("SELECT shingle_h60('a b c', cast(id AS int)) FROM range(1)").head())
    assertThrows[Exception](s.sql("SELECT shingle_h60('a b c', 'x')").head())
  }

  test("shingle_h60 accepts any foldable integral constant for n") {
    val lit = s.sql("SELECT shingle_h60('a b c d', 3)").head().getSeq[Long](0)
    // a constant arithmetic expression and wider integral literals fold
    assert(s.sql("SELECT shingle_h60('a b c d', 1 + 2)").head().getSeq[Long](0) == lit)
    assert(s.sql("SELECT shingle_h60('a b c d', cast(3 AS bigint))").head().getSeq[Long](0) == lit)
    assert(s.sql("SELECT shingle_h60('a b c d', cast(3 AS smallint))").head().getSeq[Long](0) == lit)
  }

  test("repetition_stats equals the composed distinct/count pipeline") {
    val rnd = new scala.util.Random(23)
    val planted = Seq(
      "", "a", "a b", "a a", "a b c", "a b a b a b", "dup dup dup dup",
      "a  b", " leading", "trailing ", "x y x y x z x y",
      "unicode héllo wörld héllo wörld héllo",
      (1 to 40).map(i => s"tok${i % 5}").mkString(" "))
    val fuzz = (0 until 200).map(_ =>
      Seq.fill(rnd.nextInt(30))(rnd.alphanumeric.take(1 + rnd.nextInt(3)).mkString)
        .mkString(" "))
    val composed =
      """named_struct(
        |  'n_tokens', size(_toks),
        |  'n_distinct_tokens', size(array_distinct(_toks)),
        |  'n_2grams', size(_g2),
        |  'n_distinct_2grams', size(array_distinct(_g2)),
        |  'max_2gram_count', array_max(transform(array_distinct(_g2), u -> size(filter(_g2, x -> x = u))))
        |) AS ref""".stripMargin
    val bad = (planted ++ fuzz).toDF("t")
      .selectExpr("t", "split(t, ' ') AS _toks")
      .selectExpr("t", "_toks",
        "transform(sequence(1, greatest(size(_toks) - 1, 1)), i -> array_join(slice(_toks, i, 2), ' ')) AS _g2")
      .selectExpr("repetition_stats(t) AS fast", composed)
      .filter("fast <> ref").count()
    assert(bad == 0)
  }

  test("repetition_stats: null text yields null") {
    assert(s.sql("SELECT repetition_stats(cast(NULL AS string))").head().isNullAt(0))
  }

  test("simhash32 equals the 32 composed aggregate() bit votes") {
    val bits = (0 until 32).map { j =>
      s"(CASE WHEN aggregate(hs, 0L, (acc, h) -> acc + (CASE WHEN (shiftright(h, $j) & 1) = 1 THEN 1 ELSE -1 END)) > 0 THEN ${1L << j}L ELSE 0L END)"
    }.mkString(" + ")
    val rnd = new scala.util.Random(31)
    val rows = (0 until 200).map { _ =>
      Tuple1(Array.fill(rnd.nextInt(40))(
        if (rnd.nextInt(20) == 0) null.asInstanceOf[java.lang.Long]
        else java.lang.Long.valueOf(rnd.nextLong() >>> 4)))
    }
    val bad = rows.toDF("hs")
      .selectExpr("simhash32(hs) AS fast", s"cast($bits AS bigint) AS ref")
      .filter("fast <> ref").count()
    assert(bad == 0)
    // empty array → 0; null input → null
    val r = s.sql("SELECT simhash32(cast(array() AS array<bigint>)), " +
      "simhash32(cast(NULL AS array<bigint>))").head()
    assert(r.getLong(0) == 0L && r.isNullAt(1))
  }

  test("simhash60 equals the 60 composed aggregate() bit votes") {
    val bits = (0 until 60).map { j =>
      s"(CASE WHEN aggregate(hs, 0L, (acc, h) -> acc + (CASE WHEN (shiftright(h, $j) & 1) = 1 THEN 1 ELSE -1 END)) > 0 THEN ${1L << j}L ELSE 0L END)"
    }.mkString(" + ")
    val rnd = new scala.util.Random(47)
    val rows = (0 until 200).map { _ =>
      Tuple1(Array.fill(rnd.nextInt(40))(
        if (rnd.nextInt(20) == 0) null.asInstanceOf[java.lang.Long]
        else java.lang.Long.valueOf(rnd.nextLong() >>> 4)))
    }
    val bad = rows.toDF("hs")
      .selectExpr("simhash60(hs) AS fast", s"cast($bits AS bigint) AS ref")
      .filter("fast <> ref").count()
    assert(bad == 0)
    val r = s.sql("SELECT simhash60(cast(array() AS array<bigint>)), " +
      "simhash60(cast(NULL AS array<bigint>))").head()
    assert(r.getLong(0) == 0L && r.isNullAt(1))
  }

  test("minhash_sig equals the per-permutation array_min compositions") {
    val P = MinHashFamily.P
    val mins = MinHashFamily.perms.zipWithIndex.map { case ((a, b), i) =>
      s"array_min(transform(hs, x -> ($a * x + $b) % $P)) AS r$i"
    }
    val rnd = new scala.util.Random(13)
    val rows = (0 until 200).map { _ =>
      Tuple1(Array.fill(1 + rnd.nextInt(50))(rnd.nextLong(P)))
    }
    val df = rows.toDF("hs")
      .selectExpr("minhash_sig(hs) AS sig" +: mins: _*)
      .collect()
    df.foreach { r =>
      val sig = r.getSeq[Long](0)
      (0 until MinHashFamily.NumPerms).foreach { i =>
        assert(sig(i) == r.getLong(i + 1))
      }
    }
  }

  test("minhash_sig on an empty set is all null (array_min semantics)") {
    val sig = s.sql("SELECT minhash_sig(cast(array() AS array<bigint>))")
      .head().getSeq[Any](0)
    assert(sig.length == MinHashFamily.NumPerms && sig.forall(_ == null))
  }
}
