package graft.operators

import graft.{Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import java.sql.Timestamp

/** Independent Scala recomputes and constructed fixtures for the r12
  * audit family — each test derives the expected answer from first
  * principles (BigInt arithmetic, brute-force scans), never from the
  * operator under test. */
class AuditOpsSuite extends AnyFunSuite with Matchers {

  private def ts(day: Int, h: Int = 12, m: Int = 0, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $h%02d:$m%02d:$sec%02d")

  test("gini matches the BigInt brute-force formula per group") {
    val s = TestSpark.spark
    import s.implicits._
    val data = Map(
      "a" -> Seq(1.0, 2.0, 3.0, 4.0),
      "b" -> Seq(5.0, 5.0, 5.0),          // perfect equality: G = 0
      "c" -> Seq(0.000001, 10.0))          // extreme spread
    val ev = data.toSeq.flatMap { case (t, vs) => vs.map(v => (t, v)) }
      .toDF("event_type", "value")
    val got = AuditOps.giniByGroup(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    data.foreach { case (t, vs) =>
      val micros = vs.map(v => BigInt(math.round(v * 1e6))).sorted
      val n = BigInt(micros.size)
      val sv = micros.sum
      val siv = micros.zipWithIndex.map { case (v, i) => v * (i + 1) }.sum
      val gini = (BigInt(2) * siv - (n + 1) * sv) * 1000000 / (n * sv)
      assert(got(t) === ((n.toLong, sv.toLong, gini.toLong)), s"group $t")
    }
    assert(got("b")._3 === 0L)
  }

  test("ks_drift matches a brute-force two-sample ECDF scan") {
    val s = TestSpark.spark
    import s.implicits._
    // First half (ids 1-5) low values, second half (ids 6-10) shifted.
    val vals = Seq(1.0, 2.0, 2.0, 3.0, 4.0, 3.0, 5.0, 6.0, 6.0, 7.0)
    val ev = vals.zipWithIndex
      .map { case (v, i) => ("x", (i + 1).toLong, v) }
      .toDF("event_type", "event_id", "value")
    val row = AuditOps.ksDrift(ev).collect().head
    val micros = vals.map(v => math.round(v * 1e6))
    val (h1, h2) = micros.splitAt(5)
    val grid = micros.distinct.sorted
    val ksNum = grid.map { v =>
      val c1 = BigInt(h1.count(_ <= v)) * h2.size
      val c2 = BigInt(h2.count(_ <= v)) * h1.size
      (c1 - c2).abs
    }.max
    assert(row.getLong(1) === 5L)
    assert(row.getLong(2) === 5L)
    assert(row.getLong(3) === ksNum.toLong)
    assert(row.getLong(4) === (ksNum * 1000000 / (5 * 5)).toLong)
  }

  test("winsorize: rank-ceil bounds, clamp counts, winsorized mean") {
    val s = TestSpark.spark
    import s.implicits._
    val ev = (1 to 20).map(i => ("x", i.toLong, i.toDouble))
      .toDF("event_type", "event_id", "value")
    val r = AuditOps.winsorize(ev).collect().head
    // n=20: lo rank ceil(1)=1 -> 1.0; hi rank ceil(19)=19 -> 19.0.
    assert(r.getLong(1) === 20L)
    assert(r.getLong(2) === 1000000L)
    assert(r.getLong(3) === 19000000L)
    assert(r.getLong(4) === 0L) // nothing strictly below the min
    assert(r.getLong(5) === 1L) // only 20 exceeds 19
    // clamped sum = (1+..+19) + 19 = 209 -> mean 209/20 = 10.45
    assert(r.getLong(6) === 10450000L)
  }

  test("burstiness: metronomic gaps give CV^2 = 0; a known mix checks out") {
    val s = TestSpark.spark
    import s.implicits._
    val even = (0 until 5).map(i => ("m", i.toLong, ts(1, 12, 0, i)))
      .toDF("event_type", "event_id", "ts")
    val r0 = AuditOps.burstiness(even).collect().head
    assert(r0.getLong(1) === 4L)
    assert(r0.getLong(2) === 1000000L)
    assert(r0.getLong(3) === 0L)
    // Gaps 1 s and 3 s: CV^2 = (2*(1+9) - 16)/16 = 0.25.
    val mix = Seq(("x", 1L, ts(1, 12, 0, 0)), ("x", 2L, ts(1, 12, 0, 1)),
      ("x", 3L, ts(1, 12, 0, 4)))
      .toDF("event_type", "event_id", "ts")
    val r1 = AuditOps.burstiness(mix).collect().head
    assert(r1.getLong(1) === 2L)
    assert(r1.getLong(2) === 2000000L)
    assert(r1.getLong(3) === 250000L)
  }

  test("changepoint finds a constructed level shift at its true split") {
    val s = TestSpark.spark
    import s.implicits._
    val ev = (1 to 10).map(day =>
      ("x", ts(day), if (day <= 5) 1.0 else 9.0))
      .toDF("event_type", "ts", "value")
    val r = AuditOps.changepointDaily(ev).collect().head
    assert(r.getDate(1).toString === "2024-01-05")
    assert(r.getLong(2) === 5L)  // k_days
    assert(r.getLong(3) === 10L) // n_days
    // D_5 = |10*5e6 - 5*50e6| = 2e8 -> cusum = 2e7 micro
    assert(r.getLong(4) === 20000000L)
    assert(r.getLong(5) === 1000000L)
    assert(r.getLong(6) === 9000000L)
    assert(r.getLong(7) === 8000000L)
  }

  test("seq_gaps: islands, totals, and earliest-start tie-break") {
    val s = TestSpark.spark
    import s.implicits._
    val ev = (Seq(1L, 2L, 5L, 6L, 10L).map(("a", _)) ++
      Seq(1L, 4L, 7L).map(("b", _)))
      .toDF("event_type", "event_id")
    val out = AuditOps.seqGaps(ev).orderBy("event_type").collect()
    val a = out(0)
    assert((a.getLong(1), a.getLong(2), a.getLong(3), a.getLong(4)) ===
      ((2L, 5L, 3L, 7L))) // gaps 3-4 and 7-9; largest is 7-9
    val b = out(1)
    // two equal-length gaps (2-3, 5-6): tie resolves to the EARLIER start
    assert((b.getLong(1), b.getLong(2), b.getLong(3), b.getLong(4)) ===
      ((2L, 4L, 2L, 2L)))
  }

  test("user_overlap: Jaccard on constructed audiences; disjoint pairs absent") {
    val s = TestSpark.spark
    import s.implicits._
    val ev = (Seq(1L, 2L, 3L).map(("a", _)) ++ Seq(2L, 3L, 4L).map(("b", _))
      ++ Seq(9L).map(("c", _)) ++ Seq(2L).map(("a", _))) // dup row: distinct
      .toDF("event_type", "user_id")
    val out = AuditOps.userOverlap(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out(("a", "b")) === ((3L, 3L, 2L, 500000L)))
    assert(!out.contains(("a", "c")) && !out.contains(("b", "c")))
  }

  test("vocab_growth: first-appearance buckets and cumulative vocabulary") {
    val s = TestSpark.spark
    import s.implicits._
    val docs = Seq((1L, "a b"), (2L, "b c"), (3L, "a"), (4L, "d"),
      (5L, "a")).toDF("doc_id", "text")
    val out = AuditOps.vocabGrowth(docs).orderBy("ckpt").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out === Seq(
      (1L, 1L, 2L, 2L), (2L, 2L, 1L, 3L), (3L, 3L, 0L, 3L),
      (4L, 4L, 1L, 4L), (5L, 5L, 0L, 4L)))
  }

  test("seasonal_adjust: a weekday-flat series adjusts to itself") {
    val s = TestSpark.spark
    import s.implicits._
    // 14 identical days: every weekday index is exactly 1e6.
    val ev = (1 to 14).map(day => ("x", ts(day), 5.0))
      .toDF("event_type", "ts", "value")
    val out = AuditOps.seasonalAdjust(ev).collect()
    assert(out.length === 14)
    out.foreach { r =>
      assert(r.getLong(3) === 1000000L)
      assert(r.getLong(4) === r.getLong(2))
    }
  }

  test("session_stats: boundaries at the 30-min gap, entry pick, bounce count") {
    val s = TestSpark.spark
    import s.implicits._
    // user 1: 3 events within 30 min (one session, entry 'view'), then a
    // 31-min silence and 1 more event (a bounce session, entry 'click').
    // user 2: a single event (bounce, entry 'view').
    val ev = Seq(
      (1L, 1L, "view", ts(1, 12, 0, 0)), (1L, 2L, "click", ts(1, 12, 10)),
      (1L, 3L, "purchase", ts(1, 12, 40)),
      (1L, 4L, "click", ts(1, 13, 11)),
      (2L, 5L, "view", ts(2)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = AuditOps.sessionStats(ev).orderBy("entry_type").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // 'view' entries: sessions {u1 s1 (3 events), u2 (1 event)} -> one bounce
    assert(out("view") === ((2L, 1L, 500000L, 2000000L)))
    // 'click' entry: the post-gap singleton
    assert(out("click") === ((1L, 1L, 1000000L, 1000000L)))
    assert(!out.contains("purchase"))
  }

  test("convert_delay: counts, rate, and rank-ceil quantiles on a known set") {
    val s = TestSpark.spark
    import s.implicits._
    // 4 viewers; 3 convert with delays 10, 20, 30 min; one purchase-only
    // user (no view) and one purchase-before-view user are excluded.
    val ev = Seq(
      (1L, "view", ts(1, 10)), (1L, "purchase", ts(1, 10, 10)),
      (2L, "view", ts(1, 10)), (2L, "purchase", ts(1, 10, 20)),
      (3L, "view", ts(1, 10)), (3L, "purchase", ts(1, 10, 30)),
      (4L, "view", ts(1, 10)),
      (5L, "purchase", ts(1, 9)),
      (6L, "purchase", ts(1, 8)), (6L, "view", ts(1, 9)))
      .toDF("user_id", "event_type", "ts")
    val r = AuditOps.convertDelay(ev).collect().head
    assert(r.getLong(0) === 5L) // viewers: 1,2,3,4,6
    assert(r.getLong(1) === 3L)
    assert(r.getLong(2) === 600000L)
    val mn = 60L * 1000000
    // ranks over n=3: ceil(.25*3)=1, ceil(.5*3)=2, ceil(.75*3)=3, ceil(.9*3)=3
    assert(r.getLong(3) === 10 * mn)
    assert(r.getLong(4) === 20 * mn)
    assert(r.getLong(5) === 30 * mn)
    assert(r.getLong(6) === 30 * mn)
  }

  test("markov_stationary: a deterministic 2-cycle alternates, then holds") {
    val s = TestSpark.spark
    import s.implicits._
    // One user bouncing a<->b: P(a->b)=P(b->a)=1. pi0 = (0.5, 0.5) and
    // every iteration maps it to itself exactly.
    val ev = (1 to 8).map(i =>
      (1L, i.toLong, if (i % 2 == 1) "a" else "b"))
      .toDF("user_id", "event_id", "event_type")
    val out = AuditOps.markovStationary(ev).orderBy("event_type").collect()
    out.foreach { r =>
      (1 to 4).foreach(i => assert(r.getLong(i) === 500000L, r))
    }
    // An absorbing sink drains mass: pairs (a,a)x2 (a,b)x1 (b,b)x2, so
    // the floored micro matrix is P(a->a)=666666, P(a->b)=333333,
    // P(b->b)=1e6 — hand-unrolled floored rounds below.
    val ev2 = Seq("a", "a", "a", "b", "b", "b").zipWithIndex
      .map { case (t, i) => (1L, (i + 1).toLong, t) }
      .toDF("user_id", "event_id", "event_type")
    val m = AuditOps.markovStationary(ev2).orderBy("event_type").collect()
      .map(r => r.getString(0) -> (1 to 4).map(r.getLong).toList).toMap
    assert(m("a") === List(500000L, 333333L, 222221L, 148147L))
    assert(m("b") === List(500000L, 666666L, 777776L, 851849L))
  }

  test("bootstrap_ci: deterministic, ordered bounds, means inside the value range") {
    val s = TestSpark.spark
    import s.implicits._
    val rnd = new scala.util.Random(43)
    val ev = (1 to 400).map(i => (i.toLong, 1.0 + rnd.nextDouble() * 99))
      .toDF("event_id", "value")
    val r1 = AuditOps.bootstrapCi(ev).collect().head
    val r2 = AuditOps.bootstrapCi(ev).collect().head
    assert(r1 === r2) // hash-seeded replicas: same input, same interval
    val (lo, hi) = (r1.getLong(2), r1.getLong(3))
    assert(lo <= hi && r1.getLong(4) === hi - lo)
    // replica means are weighted means of the same values — bounded by them
    assert(lo >= 1000000L && hi <= 100000000L)
    // the interval brackets a neighborhood of the point estimate
    val mean = r1.getLong(1)
    assert(lo <= mean + r1.getLong(4) && hi >= mean - r1.getLong(4))
  }

  test("neyman_alloc: budget conserved exactly; variance earns samples; " +
      "constant strata fall back proportional") {
    val s = TestSpark.spark
    import s.implicits._
    val rnd = new scala.util.Random(3)
    // 'wide' has ~10x the spread of 'narrow'; 'flat' is constant.
    val ev = ((1 to 300).map(i => ("wide", 50.0 + rnd.nextGaussian() * 20)) ++
      (1 to 300).map(i => ("narrow", 50.0 + rnd.nextGaussian() * 2)) ++
      (1 to 300).map(_ => ("flat", 7.0)))
      .toDF("event_type", "value")
    val out = AuditOps.neymanAlloc(ev, 100L).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(out.values.sum === 100L)
    assert(out("flat") === 0L)          // zero variance -> zero budget
    assert(out("wide") > out("narrow") * 5) // ~10x sd -> ~10x allocation
    // All-constant strata: weights fall back to size-proportional.
    val const = ((1 to 30).map(_ => ("a", 1.0)) ++
      (1 to 60).map(_ => ("b", 2.0))).toDF("event_type", "value")
    val c = AuditOps.neymanAlloc(const, 9L).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(c("a") === 3L && c("b") === 6L)
  }

  test("lorenz: known decile shares on 1..10; curve monotone, ends at 1e6") {
    val s = TestSpark.spark
    import s.implicits._
    val ev = (1 to 10).map(i => ("x", i.toDouble))
      .toDF("event_type", "value")
    val out = AuditOps.lorenzDeciles(ev).orderBy("decile").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(out.map(_._1) === (1L to 10L))
    // decile d boundary is rank d; share = (1+..+d)/55
    (1 to 10).foreach { d =>
      val expect = BigInt((1 to d).sum) * 1000000 / 55
      assert(out(d - 1)._2 === expect.toLong, s"decile $d")
    }
    assert(out.last._2 === 1000000L)
    assert(out.sliding(2).forall { case Array(a, b) => a._2 <= b._2 })
  }

  test("hour_profile: cells land on the event hours; shares sum to ~1e6") {
    val s = TestSpark.spark
    import s.implicits._
    val ev = Seq(
      ("x", ts(1, 9), 10.0), ("x", ts(1, 9, 30), 30.0), // Mon 09
      ("x", ts(7, 23), 60.0))                           // Sun 23
      .toDF("event_type", "ts", "value")
    val out = AuditOps.hourProfile(ev).orderBy("dow", "hour").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    assert(out.toSeq === Seq((1, 9, 2L, 40000000L, 400000L),
      (7, 23, 1L, 60000000L, 600000L)))
    assert(out.map(_._5).sum === 1000000L)
  }

  test("dedup_yield: consistent with the pair engine and monotone in the threshold") {
    val s = TestSpark.spark
    val docs = Tables.documents(s, "/root/testdata/sf0.001")
    val out = AuditOps.dedupYield(docs).orderBy("pct").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1) === Seq(50L, 60L, 70L, 80L, 90L))
    val nDocs = docs.count()
    out.foreach { case (_, _, removed, kept) =>
      assert(removed + kept === nDocs)
    }
    // Tightening the threshold can only shrink pair and removal counts.
    out.toSeq.sliding(2).foreach {
      case Seq(lo, hi) => assert(hi._2 <= lo._2 && hi._3 <= lo._3)
      case _ => ()
    }
    val pairs50 = LlmQueries
      .minhashPairsUnordered(docs, "doc_id", "text", 0.5).count()
    assert(out.head._2 === pairs50)
  }
}
