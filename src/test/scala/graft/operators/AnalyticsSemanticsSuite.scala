package graft.operators

import graft.{SparkEntry, Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Independent in-JVM recomputation of the round-11 analytics operators:
  * a from-scratch Scala implementation (no Spark, no SQL) must agree with
  * the registered query row for row — a second oracle beside DuckDB, with
  * different failure modes (these catch a wrong WINDOW FRAME or horizon
  * comparison that a coincidentally-agreeing SQL twin would share). */
class AnalyticsSemanticsSuite extends AnyFunSuite {
  private val s = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Sorted-longs interpolated median (factor 0 or exactly 0.5) — the
    * percentile(…, 0.5) contract over integer inputs. */
  private def median(xs: Seq[Long]): Double = {
    val a = xs.sorted
    val n = a.length
    if (n % 2 == 1) a(n / 2).toDouble
    else (a(n / 2 - 1) + a(n / 2)) / 2.0
  }

  test("q_mad_outliers matches a from-scratch Scala recompute") {
    val ev = Tables.events(s, sf)
      .selectExpr("event_type", "event_id",
        "cast(round(value * 1000000) AS bigint) AS vm")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (et, rows) =>
      val med = median(rows.map(_._3).toSeq)
      val mad = median(rows.map(t => math.abs(t._3 - med).toLong).toSeq)
      if (mad <= 0) Seq.empty
      else rows
        .map { case (_, id, vm) => (id, 0.6745 * (vm - med) / mad) }
        .sortBy { case (id, rz) => (-math.abs(rz), id) }
        .take(5)
        .map { case (id, rz) => (et, id, round6(rz)) }
    }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("q_mad_outliers")(s, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
      .toSeq
    assert(got == expected, s"got=${got.take(8)} expected=${expected.take(8)}")
  }

  test("q_mad_outliers deviations are exact multiples of 0.5 micro-units " +
      "(the interpolation-exactness argument)") {
    val ev = Tables.events(s, sf)
      .selectExpr("event_type",
        "cast(round(value * 1000000) AS bigint) AS vm")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    ev.groupBy(_._1).foreach { case (_, rows) =>
      val med = median(rows.map(_._2).toSeq)
      assert(med * 2 == math.rint(med * 2)) // multiple of 0.5, exact
      rows.foreach { case (_, vm) =>
        val dev = math.abs(vm - med)
        assert(dev * 2 == math.rint(dev * 2))
      }
    }
  }

  test("q_attribution matches a from-scratch horizon walk, including the " +
      "exactly-300 boundary semantics") {
    val ev = Tables.events(s, sf)
      .selectExpr("user_id", "event_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      var lastClick = Option.empty[Long]
      rows.sortBy(_._2).flatMap { case (uid, id, et, v) =>
        if (et == "click") { lastClick = Some(id); None }
        else if (et == "purchase") {
          val in = lastClick.filter(c => id - c <= 300) // inclusive horizon
          Some((id, uid, in, in.map(id - _), v))
        } else None
      }
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_attribution")(s, sf)
      .collect().map { r =>
        (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          r.getDouble(4))
      }.toSeq
    assert(got == expected,
      s"got=${got.take(5)} expected=${expected.take(5)}")
    // unattributed purchases must be present, not dropped
    assert(got.exists(_._3.isEmpty) || got.forall(_._3.nonEmpty))
  }

  test("q_transitions probabilities per from-type sum to <= 1e6 with " +
      "integer flooring") {
    val got = SparkEntry.queries("q_transitions")(s, sf)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (ft, rows) =>
      val total = rows.map(_._2).sum
      rows.foreach { case (_, n, p) =>
        assert(p == n * 1000000L / total, s"$ft: $n/$total -> $p")
      }
      val psum = rows.map(_._3).sum
      assert(psum <= 1000000L && psum > 1000000L - rows.length,
        s"$ft p-sum $psum")
    }
  }
}
