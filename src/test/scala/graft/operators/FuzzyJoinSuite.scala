package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Segment-blocked edit-distance join semantics: every edit kind
  * (deletion, insertion, substitution) at every position must survive the
  * blocking — the pigeonhole claim is "zero false negatives", so the
  * suite checks the blocked join EQUALS the brute-force cross join on
  * fixtures designed to stress the segment boundaries. */
class FuzzyJoinSuite extends AnyFunSuite {
  private val s = TestSpark.spark
  import s.implicits._

  private val catalog = Seq(
    (1L, "alpha widget economy"),
    (2L, "alpha widget premium"),
    (3L, "beta gizmo economy"),
    (4L, "gamma bolt small"),
    (5L, "x"))                       // degenerate 1-char entity
    .toDF("entity_id", "ename")

  private def blocked(m: Seq[(Long, String)]) =
    FuzzyJoin.editJoin1(catalog, "entity_id", "ename",
        m.toDF("mention_id", "mname"), "mention_id", "mname")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def brute(m: Seq[(Long, String)]) = {
    val cat = catalog.collect().map(r => (r.getLong(0), r.getString(1)))
    (for {
      (mid, mn) <- m
      (cid, cn) <- cat
      d = levDist(mn, cn) if d <= 1
    } yield (mid, cid, d.toLong)).toSet
  }

  private def levDist(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  test("every single-edit variant at every position is found (lossless)") {
    val base = "alpha widget economy"
    val variants = (
      base.indices.map(i => base.take(i) + base.drop(i + 1)) ++      // del
      (0 to base.length).map(i => base.take(i) + "Z" + base.drop(i)) ++ // ins
      base.indices.map(i => base.take(i) + "Z" + base.drop(i + 1)) ++   // sub
      Seq(base)                                                         // exact
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    assert(blocked(variants) == brute(variants))
    // and the exact mention matched at dist 0
    val exactId = variants.collectFirst { case (id, t) if t == base => id }.get
    assert(blocked(variants).contains((exactId, 1L, 0L)))
  }

  test("ambiguous mentions match every entity within distance 1") {
    // one substitution away from BOTH 'economy' and 'premium' variants is
    // impossible (they differ by 7 chars), but a mention equal to entity 1
    // matches only entity 1 even though entity 2 shares a 13-char prefix.
    val r = blocked(Seq((100L, "alpha widget economy")))
    assert(r == Set((100L, 1L, 0L)))
  }

  test("two edits never match; unrelated strings never match") {
    val r = blocked(Seq(
      (200L, "ZZpha widget economy"),   // 2 substitutions from entity 1
      (201L, "totally unrelated name")))
    assert(r.isEmpty, r.toString)
  }

  test("degenerate tiny strings do not crash the suffix arithmetic") {
    val r = blocked(Seq((300L, "x"), (301L, "xy"), (302L, "")))
    val b = brute(Seq((300L, "x"), (301L, "xy"), (302L, "")))
    // blocked may legitimately MISS pairs whose catalog length < 2 (the
    // l >= 2 probe guard) — assert no false positives and that the
    // guard's only casualties involve the 1-char entity.
    assert(r.subsetOf(b))
    assert((b -- r).forall(_._2 == 5L), (b -- r).toString)
  }

  test("randomized corpora: blocked == brute force") {
    val rnd = new scala.util.Random(42)
    val words = Seq("red", "blue", "big", "bolt", "gear", "ring", "mini")
    def name() = Seq.fill(3)(words(rnd.nextInt(words.length))).mkString(" ")
    val cat2 = (1L to 40L).map(i => (i, name())).distinct
    val cata = cat2.toDF("entity_id", "ename").groupBy("ename")
      .agg(min("entity_id").as("entity_id"))
    val mentions = (1L to 60L).map { i =>
      val n = name()
      val p = rnd.nextInt(n.length)
      val mutated = rnd.nextInt(3) match {
        case 0 => n.take(p) + n.drop(p + 1)
        case 1 => n.take(p) + "q" + n.drop(p)
        case _ => n.take(p) + "q" + n.drop(p + 1)
      }
      (i, mutated)
    }
    val got = FuzzyJoin.editJoin1(cata, "entity_id", "ename",
        mentions.toDF("mention_id", "mname"), "mention_id", "mname")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val catCollected = cata.collect().map(r => (r.getString(0), r.getLong(1)))
    val want = (for {
      (mid, mn) <- mentions
      (cn, cid) <- catCollected
      d = levDist(mn, cn) if d <= 1
    } yield (mid, cid, d.toLong)).toSet
    assert(got == want)
  }
}
