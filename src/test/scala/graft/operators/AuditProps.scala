package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Randomized properties for the r12 audit family — seeded generators
  * (deterministic across runs), each checked against a brute-force or
  * closed-form expectation. */
class AuditProps extends AnyFunSuite {
  private val s = TestSpark.spark
  import s.implicits._

  private def day(d: Int): Timestamp =
    Timestamp.valueOf(f"2024-${1 + (d - 1) / 28}%02d-${1 + (d - 1) % 28}%02d 12:00:00")

  test("changepoint recovers a noise-free level shift at any split point") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 8) {
      val n = 8 + rnd.nextInt(20)
      val k = 1 + rnd.nextInt(n - 1)
      val (lo, hi) = (1.0 + rnd.nextInt(5), 20.0 + rnd.nextInt(50))
      val ev = (1 to n).map(d => ("x", day(d), if (d <= k) lo else hi))
        .toDF("event_type", "ts", "value")
      val r = AuditOps.changepointDaily(ev).collect().head
      // On a clean step the CUSUM |n·S_j − j·S| is strictly maximized at
      // the boundary j = k (it is piecewise linear in j, rising to the
      // step and falling after), so the argmax must land exactly there.
      assert(r.getLong(2) === k.toLong, s"n=$n k=$k lo=$lo hi=$hi")
      assert(r.getLong(5) === math.round(lo * 1e6))
      assert(r.getLong(6) === math.round(hi * 1e6))
    }
  }

  test("gini bounds and ordering: equal < mild spread < extreme spread") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 6) {
      val n = 3 + rnd.nextInt(40)
      val vals = Seq.fill(n)(0.01 + rnd.nextDouble() * 100)
      val ev = (vals.map(("flat", _)) ++ vals.map(v => ("same", 7.5)))
        .toDF("event_type", "value")
      val out = AuditOps.giniByGroup(ev).collect()
        .map(r => r.getString(0) -> r.getLong(3)).toMap
      // G is always in [0, 1e6); a constant column is exactly 0.
      assert(out("same") === 0L)
      assert(out("flat") >= 0L && out("flat") < 1000000L)
    }
  }

  test("ks_drift is 0 when both halves are identical, maximal when disjoint") {
    // Identical halves: first 10 values repeat as ids 11-20.
    val vals = (1 to 10).map(_.toDouble)
    val same = (vals ++ vals).zipWithIndex
      .map { case (v, i) => ("s", (i + 1).toLong, v) }
      .toDF("event_type", "event_id", "value")
    val r0 = AuditOps.ksDrift(same).collect().head
    assert(r0.getLong(4) === 0L)
    // Disjoint supports: KS = 1 exactly.
    val disj = ((1 to 10).map(_.toDouble) ++ (101 to 110).map(_.toDouble))
      .zipWithIndex.map { case (v, i) => ("d", (i + 1).toLong, v) }
      .toDF("event_type", "event_id", "value")
    val r1 = AuditOps.ksDrift(disj).collect().head
    assert(r1.getLong(4) === 1000000L)
  }

  test("winsorize never clamps more than the nominal tails") {
    val rnd = new scala.util.Random(23)
    for (_ <- 0 until 6) {
      val n = 10 + rnd.nextInt(200)
      val ev = (1 to n).map(i => ("x", i.toLong, rnd.nextDouble() * 1000))
        .toDF("event_type", "event_id", "value")
      val r = AuditOps.winsorize(ev).collect().head
      // fewer than ceil(5% n) strictly below the p05 value, and ≤ 5% + 1
      // above p95 (ties at the bound are kept, never clamped)
      assert(r.getLong(4) < (5 * n + 99) / 100)
      assert(r.getLong(5) <= n - (95 * n + 99) / 100 + 1)
      assert(r.getLong(2) <= r.getLong(3)) // lo <= hi
    }
  }

  test("degenerate inputs: 1-event types leave ks_drift; an instantaneous " +
      "burst gets NULL CV^2 instead of a divide-by-zero") {
    val ev = Seq(("solo", 1L, 5.0), ("pair", 2L, 1.0), ("pair", 3L, 9.0))
      .toDF("event_type", "event_id", "value")
    val ks = AuditOps.ksDrift(ev).collect()
    assert(ks.map(_.getString(0)).toSeq === Seq("pair"))
    // all events of a type at the SAME instant: gaps exist but sum to 0
    val burst = (1 to 4).map(i => ("b", i.toLong, day(1)))
      .toDF("event_type", "event_id", "ts")
    val r = AuditOps.burstiness(burst).collect().head
    assert(r.getLong(1) === 3L && r.getLong(2) === 0L)
    assert(r.isNullAt(3))
  }

  test("layout invariance: the audit panel is identical across 1, 3, and " +
      "16 input partitions") {
    val ev = (1 to 400).map { i =>
      (Seq("view", "click", "purchase")(i % 3), i.toLong,
        day(1 + i % 40), (i % 97) * 0.5 + 0.01, (i % 23).toLong)
    }.toDF("event_type", "event_id", "ts", "value", "user_id")
    def runs(f: org.apache.spark.sql.DataFrame => Array[String]): Unit = {
      val rs = Seq(1, 3, 16).map(n => f(ev.repartition(n)))
      assert(rs(0).sameElements(rs(1)) && rs(0).sameElements(rs(2)))
    }
    runs(d => AuditOps.changepointDaily(d).orderBy("event_type")
      .collect().map(_.toString))
    runs(d => AuditOps.ksDrift(d).orderBy("event_type")
      .collect().map(_.toString))
    runs(d => AuditOps.giniByGroup(d).orderBy("event_type")
      .collect().map(_.toString))
    runs(d => AuditOps.winsorize(d).orderBy("event_type")
      .collect().map(_.toString))
    runs(d => AuditOps.burstiness(d).orderBy("event_type")
      .collect().map(_.toString))
    runs(d => AuditOps.userOverlap(d).orderBy("type_a", "type_b")
      .collect().map(_.toString))
    runs(d => AuditOps.seasonalAdjust(d).orderBy("event_type", "day")
      .collect().map(_.toString))
    runs(d => AuditOps.seqGaps(d).orderBy("event_type")
      .collect().map(_.toString))
    runs(d => AuditOps.sessionStats(d).orderBy("entry_type")
      .collect().map(_.toString))
    runs(d => AuditOps.markovStationary(d).orderBy("event_type")
      .collect().map(_.toString))
    runs(d => AuditOps.convertDelay(d).collect().map(_.toString))
    runs(d => AuditOps.bootstrapCi(d).collect().map(_.toString))
    runs(d => AuditOps.neymanAlloc(d, 100L).orderBy("event_type")
      .collect().map(_.toString))
    runs(d => AuditOps.hourProfile(d).orderBy("event_type", "dow", "hour")
      .collect().map(_.toString))
    runs(d => AuditOps.lorenzDeciles(d).orderBy("event_type", "decile")
      .collect().map(_.toString))
    runs(d => SeriesOps.forecastDaily(d).orderBy("event_type", "day")
      .collect().map(_.toString))
    val docs = (1 to 60).map(i =>
      (i.toLong, s"tok${i % 17} tok${i % 5} tok${(i * 7) % 29}"))
      .toDF("doc_id", "text")
    val vg = Seq(1, 3, 16).map(n =>
      AuditOps.vocabGrowth(docs.repartition(n)).orderBy("ckpt")
        .collect().map(_.toString))
    assert(vg(0).sameElements(vg(1)) && vg(0).sameElements(vg(2)))
  }

  test("markov stationary mass never exceeds 1e6 and is conserved on a closed chain") {
    val rnd = new scala.util.Random(31)
    for (_ <- 0 until 5) {
      // A random walk over 3 types: the chain is closed (every type that
      // appears has outgoing mass), so each round's total floored mass
      // stays within K floors of 1e6.
      val types = Seq("a", "b", "c")
      val ev = (1 to 60).map(i =>
        (1L, i.toLong, types(rnd.nextInt(3))))
        .toDF("user_id", "event_id", "event_type")
      val rows = AuditOps.markovStationary(ev).collect()
      (1 to 4).foreach { i =>
        val tot = rows.map(_.getLong(i)).sum
        assert(tot <= 1000000L && tot > 1000000L - 8 * types.size,
          s"round $i mass $tot")
      }
    }
  }
}
