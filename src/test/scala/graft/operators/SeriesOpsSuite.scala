package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import java.sql.Timestamp

/** Controlled fixtures for the time-series/layout family: gap-fill's grid
  * and LOCF semantics, skyline's two-phase exactness against brute-force
  * dominance, and the Morton interleave's bit algebra. */
class SeriesOpsSuite extends AnyFunSuite with Matchers {

  private def ts(day: Int, h: Int = 12): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  test("gap_fill: quiet days appear, carry the last total, and count 0") {
    val s = TestSpark.spark
    import s.implicits._
    // user 1: events on days 1, 2, 5 (gap 3-4); user 2: single day.
    val ev = Seq(
      (1L, ts(1), 10.5), (1L, ts(2), 1.0), (1L, ts(2, 13), 2.0),
      (1L, ts(5), 7.0),
      (2L, ts(3), 4.25))
      .toDF("user_id", "ts", "value")
    val out = SeriesOps.gapFillDaily(ev)
      .orderBy("user_id", "day").collect()
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getDate(1).toString) ===
      Array("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04",
        "2024-01-05"))
    assert(u1.map(_.getLong(2)) === Array(1L, 2L, 0L, 0L, 1L))
    assert(u1.map(_.getBoolean(3)) ===
      Array(true, true, false, false, true))
    // filled_micro carries day-2's total (3.0) across the gap.
    assert(u1.map(_.getLong(4)) ===
      Array(10500000L, 3000000L, 3000000L, 3000000L, 7000000L))
    // single-day user: a 1-row span, no gap rows invented.
    assert(out.count(_.getLong(0) == 2L) == 1)
  }

  test("skyline matches brute-force dominance on a cross-bucket fixture") {
    val s = TestSpark.spark
    import s.implicits._
    // Prices straddle the div-10 bucket boundaries on purpose; includes
    // duplicate points (both must keep) and an equal-price dominated row.
    val pts = Seq(
      (1L, 905.0, 10), (2L, 905.0, 10),   // duplicates: both on frontier
      (3L, 905.0, 7),                     // equal price, smaller size: out
      (4L, 910.0, 15), (5L, 909.99, 15),  // 5 beats 4 (cheaper, same size)
      (6L, 950.0, 50), (7L, 999.0, 50),   // 6 beats 7
      (8L, 900.0, 1),                     // cheapest overall: frontier
      (9L, 960.0, 20))                    // dominated by 6
      .toDF("id", "price", "size")
    val got = SeriesOps.skyline(pts, "id", "price", "size")
      .collect().map(_.getLong(0)).toSet
    val rows = pts.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val brute = rows.filter { case (_, p, sz) =>
      !rows.exists { case (_, qp, qs) =>
        qp <= p && qs >= sz && (qp < p || qs > sz)
      }
    }.map(_._1).toSet
    assert(got === brute)
    assert(got === Set(1L, 2L, 5L, 6L, 8L))
  }

  test("zorder: interleave is the textbook Morton code and shards bound both dims") {
    val s = TestSpark.spark
    // Direct expression check of the bit interleave on known values.
    val z = s.sql(
      s"SELECT ${SeriesOps.zExpr("3", "5", "div")} AS z").head().getLong(0)
    // bx=3 (011), by=5 (101): z = sum of x-bits at odd positions,
    // y-bits at even: x:1@1,1@3 -> 2+8; y:1@0,1@4 -> 1+16 => 27.
    assert(z == 27L)
    import s.implicits._
    val ev = (0 until 512).map { i =>
      (i.toLong % 16L, ts(1 + i % 28), (i % 64).toDouble)
    }.toDF("user_id", "ts", "value")
    val shards = SeriesOps.zorderShards(ev).collect()
    assert(shards.map(_.getLong(1)).sum == 512L)
    // The z prefix constrains BOTH dimensions: every shard's user range
    // and value range must be proper subranges (≤ half the domain) —
    // single-column sorting would leave the second dimension unbounded.
    shards.foreach { r =>
      val (u0, u1) = (r.getLong(2), r.getLong(3))
      val (v0, v1) = (r.getDouble(4), r.getDouble(5))
      assert(u1 - u0 <= 8, s"user span too wide: $r")
      assert(v1 - v0 <= 32.0, s"value span too wide: $r")
    }
  }

  test("forecast: an exactly weekly-periodic series forecasts itself with " +
      "zero-width bands; horizons cover 1..7") {
    val s = TestSpark.spark
    import s.implicits._
    // 28 days of a strict weekly pattern: value depends only on weekday.
    val ev = (1 to 28).map(d => ("x", ts(d), 10.0 + (d % 7)))
      .toDF("event_type", "ts", "value")
    val out = SeriesOps.forecastDaily(ev).orderBy("day").collect()
    assert(out.length === 7)
    assert(out.map(_.getLong(2)).toSeq === (1L to 7L))
    out.foreach { r =>
      // every 7-lag error in history is 0 -> lo == point == hi
      assert(r.getLong(4) === r.getLong(3) && r.getLong(5) === r.getLong(3))
      // the forecast value equals the same weekday one week earlier
      val srcDay = r.getDate(1).toLocalDate.minusDays(7)
      val src = ev.selectExpr("cast(ts AS date) AS d",
          "cast(round(value * 1000000) AS bigint) AS vm")
        .where(s"d = date '$srcDay'")
        .collect().head.getLong(1)
      assert(r.getLong(3) === src)
    }
    // a noisy series still yields ordered bands: lo <= point forecastable
    val rnd = new scala.util.Random(5)
    val ev2 = (1 to 28).map(d => ("y", ts(d), 10.0 + rnd.nextInt(40)))
      .toDF("event_type", "ts", "value")
    SeriesOps.forecastDaily(ev2).collect().foreach { r =>
      assert(r.getLong(4) <= r.getLong(5)) // elo rank <= ehi rank
    }
  }
}
