package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[SampleK]] is a semilattice fold: any partition layout must produce
  * the SAME k survivors, and those survivors must equal the window form
  * (row_number over (draw, id) ascending, first k). The multi-partition
  * runs exercise merge() and the serialize/deserialize pair — partial
  * buffers ride the partial→final exchange in binary form. */
class SampleKSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic skewed fixture: group g0 holds 700 rows (hot), g1 29,
  // g2 1 (fewer than k) — draws collide across groups on purpose
  private lazy val rows = (0 until 730).map { i =>
    val g = if (i < 700) "g0" else if (i < 729) "g1" else "g2"
    (g, (i * 2654435761L) % 997, i.toLong)
  }

  private def viaAgg(parts: Int, k: Int) = {
    SampleK.ensureRegistered(spark)
    rows.toDF("g", "draw", "id").repartition(parts)
      .groupBy($"g").agg(expr(s"sample_k(draw, id, $k)").as("ids"))
      .select($"g", posexplode($"ids").as(Seq("pos", "id")))
      .select($"g", $"pos", $"id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
  }

  private def viaWindow(k: Int) =
    rows.toDF("g", "draw", "id")
      .selectExpr("g", "draw", "id",
        "row_number() OVER (PARTITION BY g ORDER BY draw, id) AS rn")
      .filter(col("rn") <= k)
      .select($"g", ($"rn" - 1).cast("int").as("pos"), $"id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet

  test("sample_k equals the window form and is partition-layout invariant") {
    val expected = viaWindow(10)
    for (parts <- Seq(1, 3, 16)) {
      assert(viaAgg(parts, 10) == expected, s"layout parts=$parts diverged")
    }
  }

  test("a group smaller than k returns all its rows, in (draw, id) order") {
    val expected = viaWindow(50)
    assert(viaAgg(7, 50) == expected)
    assert(expected.count(_._1 == "g2") == 1)
    assert(expected.count(_._1 == "g1") == 29)
  }

  test("null draw and payload rows are skipped, not sampled or thrown") {
    SampleK.ensureRegistered(spark)
    val withNulls = Seq(
      (Some(5L), Some(1L)), (None, Some(2L)), (Some(1L), None), (Some(3L), Some(4L)))
      .toDF("draw", "id")
    val out = withNulls.agg(expr("sample_k(draw, id, 10)").as("ids"))
      .selectExpr("ids").as[Seq[Long]].head()
    assert(out == Seq(4L, 1L)) // (3,4) < (5,1); null rows gone
  }

  test("k must be a positive constant") {
    SampleK.ensureRegistered(spark)
    val df = rows.toDF("g", "draw", "id")
    intercept[Exception] {
      df.groupBy($"g").agg(expr("sample_k(draw, id, 0)")).collect()
    }
    intercept[Exception] {
      df.groupBy($"g").agg(expr("sample_k(draw, id, draw)")).collect()
    }
  }

  test("an over-range bigint k fails instead of wrapping under toInt") {
    SampleK.ensureRegistered(spark)
    val df = rows.toDF("g", "draw", "id")
    // 4294967297L wraps to 1 under toInt — must be rejected as > 1e6,
    // not silently under-sample to k = 1
    val e = intercept[Exception] {
      df.groupBy($"g").agg(expr("sample_k(draw, id, 4294967297)")).collect()
    }
    assert(e.getMessage.contains("1000000"), e.getMessage)
  }
}
