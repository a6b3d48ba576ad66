package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import java.sql.Timestamp

/** Controlled fixtures for the r11 analytics panel: the EWMA shift-and-add
  * fold against hand arithmetic, the ACF's exact ±1 on a periodic series,
  * histogram edge-bin placement, path prefix/tie semantics, the
  * k-anonymity curve, and phrase search's token-boundary correctness
  * (including the substring false-positive the scan prefilter admits and
  * the position join must kill). */
class AnalyticsPanelSuite extends AnyFunSuite with Matchers {

  private def ts(day: Int, h: Int = 12): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  test("ewma: shift-and-add fold matches hand arithmetic on the ramp-up") {
    val s = TestSpark.spark
    import s.implicits._
    val ev = Seq(("a", 1L, 4.0), ("a", 2L, 8.0), ("a", 3L, 16.0),
      ("b", 1L, 7.0))
      .toDF("event_type", "event_id", "value")
    val out = SeriesOps.ewmaTrailing(ev)
      .orderBy("event_type", "event_id").collect()
    // micros 4e6, 8e6, 16e6; weights oldest→newest 1,2,4; norm 2^n − 1:
    //   n=1: 4e6/1 = 4e6
    //   n=2: (4e6 + 16e6)/3 = 6666666 (floor)
    //   n=3: (4e6 + 16e6 + 64e6)/7 = 12e6
    assert(out.map(_.getLong(2)).toSeq ===
      Seq(4000000L, 6666666L, 12000000L, 7000000L))
  }

  test("ewma: constant series is a fixed point at every window length") {
    val s = TestSpark.spark
    import s.implicits._
    val ev = (1 to 40).map(i => ("a", i.toLong, 3.25))
      .toDF("event_type", "event_id", "value")
    val got = SeriesOps.ewmaTrailing(ev).collect().map(_.getLong(2)).distinct
    // Σ c·2^i over i<n = c·(2^n − 1), so ewma = c exactly for ANY n —
    // including the 30-row saturated frames at the tail.
    assert(got.toSeq === Seq(3250000L))
  }

  test("autocorr: period-2 series has ACF exactly −1 at lag 1 and +1 at lag 2") {
    val s = TestSpark.spark
    import s.implicits._
    // 9 alternating days: lag-1 pairs are 4×(10,20) + 4×(20,10) → r = −1
    // exactly; lag-2 pairs are all equal-valued → r = +1 exactly. The
    // decimal-moment + shared-formula path must land on the exact pole.
    val ev = (1 to 9).map(i =>
      ("a", ts(i), if (i % 2 == 1) 10.0 else 20.0))
      .toDF("event_type", "ts", "value")
    val acf = SeriesOps.autocorrDaily(ev).collect()
      .map(r => r.getInt(1) -> r.getDouble(3)).toMap
    assert(acf(1) === -1.0)
    assert(acf(2) === 1.0)
  }

  test("histogram: min lands in bin 0, max in the last bin, counts total") {
    val s = TestSpark.spark
    import s.implicits._
    val ev = (0 to 100).map(i => Tuple1(i.toDouble)).toDF("value")
    val out = RelationalQueries.valueHistogram(ev, 20)
      .orderBy("bin").collect()
    assert(out.map(_.getLong(1)).sum === 101L)
    assert(out.head.getLong(0) === 0L && out.head.getLong(2) === 0L)
    assert(out.last.getLong(0) === 19L && out.last.getLong(3) === 100000000L)
    // observed per-bin bounds nest inside the bin order
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) < b.getLong(2))
    }
  }

  test("path_topk: prefix cut, short-history users, and the tie order") {
    val s = TestSpark.spark
    import s.implicits._
    val ev = Seq(
      // two users with the same 3-prefix (4th event must not matter)
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"), (1L, 4L, "error"),
      (2L, 1L, "view"), (2L, 2L, "click"), (2L, 3L, "purchase"),
      // a 2-event user keeps a 2-step path
      (3L, 1L, "view"), (3L, 2L, "error"),
      // two singleton paths tie at 1 — the (n DESC, path) order breaks it
      (4L, 1L, "signup"))
      .toDF("user_id", "event_id", "event_type")
    val out = RelationalQueries.pathTopk(ev, 3, 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.head === ("view>click>purchase", 2L))
    assert(out.tail.toSeq === Seq(("signup", 1L), ("view>error", 1L)))
  }

  test("k_anonymity: curve counts classes and rows below each k") {
    val s = TestSpark.spark
    import s.implicits._
    // Three QI classes (same day, value band 0): sizes 1, 3, 12.
    val ev = Seq.fill(1)(("a", ts(1), 5.0)) ++
      Seq.fill(3)(("b", ts(1), 5.0)) ++
      Seq.fill(12)(("c", ts(1), 5.0))
    val out = RelationalQueries.kAnonymityCurve(
      ev.toDF("event_type", "ts", "value")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (2, 3L, 1L, 1L),     // only the singleton class is below 2
      (5, 3L, 2L, 4L),     // sizes 1 and 3 → 4 rows at risk
      (10, 3L, 2L, 4L),
      (100, 3L, 3L, 16L))) // everything below 100
  }

  test("phrase_search: token boundaries, overlaps, and multi-word phrases") {
    val s = TestSpark.spark
    import s.implicits._
    val docs = Seq(
      (1L, "value table"),                  // 1 match at pos 0
      (2L, "x value table y value table"),  // 2 matches, first at 1
      (3L, "myvalue table"),                // substring hit, NOT a token hit
      (4L, "value value table"),            // 1 match at pos 1
      (5L, "table value"),                  // reversed: no match
      (6L, "nothing here"))
      .toDF("doc_id", "text")
    val out = TextSignals.phraseSearch(docs, "doc_id", "text",
      Seq("value", "table")).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq === Seq((1L, 1L, 0), (2L, 2L, 1), (4L, 1L, 1)))
    val tri = TextSignals.phraseSearch(docs, "doc_id", "text",
      Seq("value", "value", "table")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(tri.toSeq === Seq((4L, 1L, 0)))
  }

  test("weekday_profile: ISO numbering and exact ratios on a known cycle") {
    val s = TestSpark.spark
    import s.implicits._
    // Jan 2024: the 1st is a Monday. Two weeks, Mondays heavy (30.0),
    // all other days 10.0 → base avg = (2·30 + 12·10)/14 micros.
    val ev = (1 to 14).map(i =>
      ("a", ts(i), if ((i - 1) % 7 == 0) 30.0 else 10.0))
      .toDF("event_type", "ts", "value")
    val out = SeriesOps.weekdayProfile(ev).orderBy("dow").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.map(_._1).toSeq === (1 to 7))
    assert(out.forall(_._2 == 2L))
    val base = (2L * 30000000L + 12L * 10000000L) / 14L
    assert(out.head._3 === 30000000L)           // Monday avg
    assert(out.head._4 === 30000000L * 1000000L / base)
    assert(out.last._3 === 10000000L)           // Sunday avg
  }

  test("anomaly: a manufactured spike is flagged, the steady days are not") {
    val s = TestSpark.spark
    import s.implicits._
    // 21 days at 10.0 with one 300.0 spike on day 11: the spike's
    // residual dwarfs 3×MAD of the residual series; steady days do not.
    val ev = (1 to 21).map(i =>
      ("a", ts(i), if (i == 11) 300.0 else 10.0))
      .toDF("event_type", "ts", "value")
    val out = SeriesOps.anomalyDays(ev).orderBy("day").collect()
      .map(r => (r.getDate(1).toString, r.getBoolean(5)))
    assert(out.count(_._2) >= 1)
    assert(out.find(_._1 == "2024-01-11").exists(_._2))
    // far-from-spike steady days (outside the 7-day MA window) are clean
    Seq("2024-01-02", "2024-01-03", "2024-01-20").foreach { d =>
      assert(!out.find(_._1 == d).get._2, d)
    }
  }

  test("backtest: hand-checked MAEs and the zero-naive-MAE NULL guard") {
    val s = TestSpark.spark
    import s.implicits._
    // type a: days 1..9 with totals 1,2,1,2,... (alternating micros):
    //   |y−p1| = 1e6 every day (8 usable? only days 8,9 have lag-7);
    //   day 8: y=2, p1=1, p7=1 → e1 += 1e6, e7 += 1e6
    //   day 9: y=1, p1=2, p7=2 → e1 += 1e6, e7 += 1e6
    //   n=2, mae both 1e6, skill = 1e6 (equal skill)
    // type b: constant 5.0 → e1 = 0 → NULL skill.
    val ev = (1 to 9).flatMap { i =>
      Seq(("a", ts(i), if (i % 2 == 1) 1.0 else 2.0), ("b", ts(i), 5.0))
    }.toDF("event_type", "ts", "value")
    val out = SeriesOps.backtestDaily(ev).orderBy("event_type").collect()
    val a = out(0)
    assert(a.getLong(1) === 2L)
    assert(a.getLong(2) === 1000000L && a.getLong(3) === 1000000L)
    assert(a.getLong(4) === 1000000L)
    val b = out(1)
    assert(b.getLong(2) === 0L && b.isNullAt(4))
  }

  test("rfm: one-pass metrics and the 5-is-best score orientation") {
    val s = TestSpark.spark
    import s.implicits._
    // 5 users with strictly increasing activity: user 5 is most recent,
    // most frequent, and biggest spender → scores (5,5,5).
    val ev = (1 to 5).flatMap { u =>
      (1 to u).map(i => (u.toLong, ts(u), "purchase", u * 10.0)) :+
        ((u.toLong, ts(u), "view", 0.5))
    }.toDF("user_id", "ts", "event_type", "value")
    val out = RelationalQueries.rfmScores(ev).orderBy("user_id").collect()
    val u5 = out(4)
    assert(u5.getLong(1) === 0L)                   // recency vs anchor day 5
    assert(u5.getLong(2) === 6L)                   // 5 purchases + 1 view
    assert(u5.getLong(3) === 250000000L)           // 5 × 50.0 in micros
    assert((u5.getInt(4), u5.getInt(5), u5.getInt(6)) === ((5, 5, 5)))
    assert(u5.getInt(7) === 555)
    val u1 = out(0)
    assert((u1.getInt(4), u1.getInt(5), u1.getInt(6)) === ((1, 1, 1)))
  }

  test("benford: digit extraction is the first significant digit and " +
      "shares sum to ~1e6") {
    val s = TestSpark.spark
    import s.implicits._
    // values whose micro strings lead with known digits: 1.0 → 1000000
    // (digit 1), 0.25 → 250000 (2), 93.5 → 93500000 (9), 0.01 → 10000 (1)
    // the 0.0 row must be EXCLUDED (no leading significant digit; an
    // unexcluded zero feeds 1/0 to the expectation — the sf0.1 failure)
    val ev = Seq(1.0, 0.25, 93.5, 0.01, 0.0).map(Tuple1(_)).toDF("value")
    val out = RelationalQueries.benfordDigits(ev).orderBy("digit").collect()
    assert(out.map(r => (r.getInt(0), r.getLong(1))).toSeq ===
      Seq((1, 2L), (2, 1L), (9, 1L)))
    assert(out.map(_.getLong(2)).sum === 1000000L)
    // expectation column carries Benford's constants
    assert(out.head.getLong(3) === 301030L)  // log10(2)
  }

  test("active_users: contribution-explode equals a brute-force trailing " +
      "distinct, quiet days report zero") {
    val s = TestSpark.spark
    import s.implicits._
    // user 1 on days 1 and 10; user 2 on days 1-2; user 3 on day 9.
    val ev = Seq((1L, ts(1)), (1L, ts(10)), (2L, ts(1)), (2L, ts(2)),
      (3L, ts(9)), (1L, ts(1, 13)))
      .map { case (u, t) => (u, t, 1.0) }
      .toDF("user_id", "ts", "value")
    val out = RelationalQueries.activeUsers(ev).orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length === 10)                       // full span grid
    val byDay = out.map(x => x._1 -> x).toMap
    assert(byDay("2024-01-01") === (("2024-01-01", 2L, 2L, 2L)))
    // day 5: nobody active, but users 1,2 were active within 7 days
    assert(byDay("2024-01-05") === (("2024-01-05", 0L, 2L, 2L)))
    // day 9: user 3 today; user 2's last activity (day 2) fell out of
    // the 7-day window (days 3-8), stays in the 28-day window
    assert(byDay("2024-01-09") === (("2024-01-09", 1L, 1L, 3L)))
    assert(byDay("2024-01-10") === (("2024-01-10", 1L, 2L, 3L)))
    // brute-force cross-check of every day's WAU
    val pairs = Seq((1L, 1), (1L, 10), (2L, 1), (2L, 2), (3L, 9))
    out.zipWithIndex.foreach { case ((_, _, wau, _), i) =>
      val d = i + 1
      val want = pairs.filter(p => p._2 <= d && p._2 > d - 7).map(_._1).distinct.size
      assert(wau === want.toLong, s"day $d")
    }
  }

  test("interval_join matches brute-force overlap within each customer") {
    val s = TestSpark.spark
    val sf = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q_interval_join")(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val orders = graft.Tables.orders(s, sf)
      .selectExpr("o_custkey", "o_orderkey",
        "to_date(o_orderdate) AS sd",
        "date_add(to_date(o_orderdate), cast(o_orderkey % 30 AS int)) AS ed")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDate(2).toLocalDate,
        r.getDate(3).toLocalDate))
    val brute = for {
      a <- orders; b <- orders
      if a._1 == b._1 && a._2 < b._2
      if !a._3.isAfter(b._4) && !b._3.isAfter(a._4)
    } yield (a._1, a._2, b._2,
      java.time.temporal.ChronoUnit.DAYS.between(
        Seq(a._3, b._3).max[java.time.LocalDate](Ordering.fromLessThan(_ isBefore _)),
        Seq(a._4, b._4).min[java.time.LocalDate](Ordering.fromLessThan(_ isBefore _))) + 1)
    assert(got.length === brute.length)
    assert(got.toSet === brute.toSet)
    assert(got.nonEmpty)
  }

  test("ltv: cumulative revenue per cohort, diluted by non-buying members") {
    val s = TestSpark.spark
    import s.implicits._
    // Cohort of week Jan-1 (Monday): users 1, 2, 3 first seen that week;
    // only user 1 buys — 10.0 in week 0 and 2.0 in week 2 (offset 2 has
    // no offset-1 row in between: the cumsum must carry across the gap).
    val ev = Seq(
      (1L, ts(1), "purchase", 10.0), (2L, ts(2), "view", 0.0),
      (3L, ts(3), "view", 0.0), (1L, ts(15), "purchase", 2.0))
      .toDF("user_id", "ts", "event_type", "value")
    val out = RelationalQueries.cohortLtv(ev)
      .orderBy("cohort_week", "week_offset").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    assert(out.toSeq === Seq(
      (0L, 1L, 10000000L, 10000000L, 3L, 3333333L),
      (2L, 1L, 2000000L, 12000000L, 3L, 4000000L)))
  }

  test("concentration: top-percent cuts on a hand-built whale distribution") {
    val s = TestSpark.spark
    import s.implicits._
    // 100 users: user 1 earns 910 micros-worth, users 2-100 earn 10 each
    // → total 1900. top 1% = user 1 → share 910·1e6/1900 div.
    val ev = (1 to 100).map { u =>
      (u.toLong, ts(1), "purchase", if (u == 1) 0.00091 else 0.00001)
    }.toDF("user_id", "ts", "event_type", "value")
    val out = RelationalQueries.revenueConcentration(ev).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSeq === Seq(1, 5, 10, 20))
    assert(out.map(_._2).toSeq === Seq(1L, 5L, 10L, 20L))
    assert(out(0)._3 === 910L * 1000000L / 1900L)
    assert(out(3)._3 === (910L + 19L * 10L) * 1000000L / 1900L)
    // shares are monotone in the cut
    assert(out.map(_._3).toSeq === out.map(_._3).sorted.toSeq)
  }

  test("asof_snapshot: keys appear only once visible, values travel back") {
    val s = TestSpark.spark
    import s.implicits._
    // key 1 changes at seq 10 (a=1.0) and 30 (b=3.0); key 2 first
    // appears at seq 25. Snapshots at 20 and 40.
    val ev = Seq(
      (10L, 1L, "view", 1.0), (30L, 1L, "click", 3.0),
      (25L, 2L, "view", 2.0))
      .toDF("event_id", "user_id", "event_type", "value")
    val snaps = Seq(20L, 40L).toDF("snap_seq")
    val out = CdcQueries.asofSnapshots(ev, snaps)
      .orderBy("snap_seq", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    assert(out.toSeq === Seq(
      (20L, 1L, 10L, 1.0),              // key 2 not yet visible at 20
      (40L, 1L, 30L, 3.0), (40L, 2L, 25L, 2.0)))
  }

  test("cluster_quality: separation is non-negative by the window order " +
      "and sizes cover every vector") {
    val s = TestSpark.spark
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q_cluster_quality")(s, sf).collect()
    val nVecs = graft.Tables.embeddings(s, sf).count()
    assert(out.map(_.getLong(1)).sum === nVecs)
    // own is position 1 and next position 2 of ONE ordered window, so
    // per-vector own ≥ next, hence every cluster's averages separate.
    out.foreach { r =>
      assert(r.getLong(2) >= r.getLong(3), r.toString)
      assert(r.getLong(4) === r.getLong(2) - r.getLong(3))
    }
  }

  test("layout invariance: ewma, histogram, and path_topk are identical " +
      "across 1, 3, and 16 input partitions") {
    val s = TestSpark.spark
    import s.implicits._
    val ev = (1 to 500).map { i =>
      (("t" + (i % 3)), i.toLong, (i % 97) * 0.5 + 0.01)
    }.toDF("event_type", "event_id", "value")
    val pev = (1 to 500).map { i =>
      ((i % 41).toLong, i.toLong, Seq("view", "click", "purchase")(i % 3))
    }.toDF("user_id", "event_id", "event_type")
    def runs[A](f: org.apache.spark.sql.DataFrame => Array[A],
        df: org.apache.spark.sql.DataFrame): Seq[Array[A]] =
      Seq(1, 3, 16).map(n => f(df.repartition(n)))
    val e = runs(d => SeriesOps.ewmaTrailing(d)
      .orderBy("event_type", "event_id").collect().map(_.getLong(2)), ev)
    assert(e(0).sameElements(e(1)) && e(0).sameElements(e(2)))
    val h = runs(d => RelationalQueries.valueHistogram(d, 20)
      .orderBy("bin").collect().map(r => (r.getLong(0), r.getLong(1))), ev)
    assert(h(0).sameElements(h(1)) && h(0).sameElements(h(2)))
    val p = runs(d => RelationalQueries.pathTopk(d, 3, 10)
      .collect().map(r => (r.getString(0), r.getLong(1))), pev)
    assert(p(0).sameElements(p(1)) && p(0).sameElements(p(2)))
  }

  test("autocorr values always lie in [-1, 1] on randomized daily shapes") {
    val s = TestSpark.spark
    import s.implicits._
    // deterministic pseudo-random series via a multiplicative hash
    val ev = (1 to 28).flatMap { i =>
      Seq(("a", ts(i), ((i * 2654435761L) % 1000) / 10.0),
        ("b", ts(i), ((i * 40503L) % 700) / 7.0))
    }.toDF("event_type", "ts", "value")
    val acf = SeriesOps.autocorrDaily(ev).collect().map(_.getDouble(3))
    acf.foreach(r => assert(r >= -1.0 && r <= 1.0, r))
    assert(acf.length === 2 * 7)
  }

  test("plan pins: active_users runs without window state, asof_snapshot " +
      "broadcasts the snapshot frame, rfm collapses the log once") {
    val sf = "/root/testdata/sf0.001"
    val pAu = SparkEntry.queries("q_active_users")(TestSpark.spark, sf)
      .queryExecution.executedPlan.toString
    // the whole panel is aggregations — no Window operator, no sliding
    // distinct state (the 100 TB argument for the contribution explode)
    assert(!pAu.contains("Window"), pAu.linesIterator.take(8).mkString("\n"))
    val pAs = SparkEntry.queries("q_asof_snapshot")(TestSpark.spark, sf)
      .queryExecution.executedPlan.toString
    assert(pAs.contains("BroadcastNestedLoopJoin"),
      pAs.linesIterator.take(8).mkString("\n"))
    val pRfm = SparkEntry.queries("q_rfm")(TestSpark.spark, sf)
      .queryExecution.executedPlan.toString
    // two scans only: the 1-row anchor and the user-grain aggregation —
    // all three metrics fold in the SAME aggregation (no per-metric
    // rescan), and the ntile windows run above the user grain
    assert("events\\.parquet".r.findAllIn(pRfm).size <= 2, pRfm)
  }

  test("plan pins: path_topk group-limits the window and phrase_search " +
      "pushes the contains prefilter to the scan") {
    val sf = "/root/testdata/sf0.001"
    val pPath = SparkEntry.queries("q_path_topk")(TestSpark.spark, sf)
      .queryExecution.executedPlan.toString
    assert(pPath.contains("WindowGroupLimit"), pPath.linesIterator.take(8).mkString("\n"))
    assert(pPath.contains("TakeOrderedAndProject"))
    val pPhrase = SparkEntry.queries("q_phrase_search")(TestSpark.spark, sf)
      .queryExecution.executedPlan.toString
    val pushed = "PushedFilters: [^\\n]*".r.findFirstIn(pPhrase).getOrElse("")
    assert(pushed.contains("StringContains"), pushed)
    val pHist = SparkEntry.queries("q_histogram")(TestSpark.spark, sf)
      .queryExecution.executedPlan.toString
    assert(pHist.contains("BroadcastNestedLoopJoin") ||
      pHist.contains("BroadcastExchange"), "histogram bounds must broadcast")
  }
}
