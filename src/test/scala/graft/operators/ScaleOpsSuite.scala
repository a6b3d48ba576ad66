package graft.operators

import graft.{SparkEntry, TestSpark}
import graft.api.Graft
import org.scalatest.funsuite.AnyFunSuite

/** The sketch queries' error contracts, exercised where the driver oracle
  * cannot reach: tie-heavy distributions (the le/lt rank bracket must
  * handle massive duplicate runs) and the sketch-only production API
  * forms. The driver's DuckDB hash check covers the testdata path; these
  * pin the contract itself so a bounds regression (round 4's failure mode)
  * is caught before any driver run. */
class ScaleOpsSuite extends AnyFunSuite {
  private val s = TestSpark.spark
  import s.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("q_approx_quantiles: every in-bounds flag holds on testdata") {
    val rows = SparkEntry.queries("q_approx_quantiles")(s, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n")) > 0)
      Seq("p50_in_bounds", "p90_in_bounds", "p99_in_bounds").foreach { c =>
        assert(r.getBoolean(r.fieldIndex(c)), s"$c false in $r")
      }
    }
  }

  test("q_approx_distinct: sketch_ok holds on testdata") {
    val rows = SparkEntry.queries("q_approx_distinct")(s, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(r.fieldIndex("sketch_ok")), r.toString))
  }

  test("approxQuantiles returns data values at the right ranks under heavy ties") {
    // 2000 rows over 10 distinct values: the sketch must return an actual
    // data value whose rank matches — the case interpolated value-space
    // bounds (round-4 bug) can never check correctly.
    val df = (0 until 2000).map(i => (i % 10).toDouble).toDF("v")
    val r = Graft.approxQuantiles(df, Nil, "v", Seq(0.5, 0.99)).head()
    assert(Set(4.0, 5.0).contains(r.getDouble(0)), r.toString)
    assert(r.getDouble(1) == 9.0, r.toString)
  }

  test("approxQuantiles groups and names percentile columns") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0))
      .toDF("g", "v")
    val out = Graft.approxQuantiles(df, Seq("g"), "v", Seq(0.5, 0.999))
    assert(out.columns.toSeq == Seq("g", "p50", "p99_9"))
    val m = out.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("a") == 2.0 && m("b") == 10.0)
  }

  test("zscoreOutliers: constant-valued group yields z = 0, never NaN") {
    // σ = 0 → the raw formula is 0/0; the guard must define z = 0 so the
    // top-k ordering stays deterministic and cross-engine comparable.
    val df = Seq(("flat", 1L, 5.0), ("flat", 2L, 5.0), ("flat", 3L, 5.0),
      ("vary", 4L, 1.0), ("vary", 5L, 2.0), ("vary", 6L, 30.0))
      .toDF("g", "id", "v")
    val out = ScaleOps.zscoreOutliers(df, "g", "id", "v", k = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getDouble(4)))
    val flat = out.filter(_._1 == "flat")
    assert(flat.length == 2)
    flat.foreach { case (_, _, _, z) =>
      assert(!z.isNaN && z == 0.0, s"flat-group z should be 0, got $z")
    }
    // ties on |z|=0 break by id ascending — deterministic
    assert(flat.map(_._3).sorted.sameElements(flat.map(_._3)))
    val vary = out.filter(_._1 == "vary")
    assert(vary.forall(t => !t._4.isNaN) && vary.head._3 == 6L)
  }

  test("approxDistinct estimate lands within the rsd contract") {
    val df = (0L until 5000L).map(i => i % 1000).toDF("k")
    val est = Graft.approxDistinct(df, Nil, "k", rsd = 0.02)
      .head().getLong(0)
    assert(math.abs(est - 1000L) <= 1000 * 3 * 0.02, s"est=$est")
    val grouped = Graft.approxDistinct(df.withColumn("g", $"k" % 2), Seq("g"), "k")
    assert(grouped.count() == 2)
  }

  test("heavyHitters is exact regardless of partitioning (MG superset " +
      "guarantee) and excludes the long tail") {
    // 3 hot keys (shares 30%/20%/12%) + a 38%-of-rows unique tail, in a
    // deliberately adversarial order (tail interleaved with hot), across
    // several partition widths — the candidate set differs per layout but
    // the exact recount must not.
    val n = 2000
    val rows = (0 until n).map { i =>
      if (i % 10 < 3) 1L else if (i % 10 < 5) 2L else if (i % 100 < 27) 3L
      else 1000L + i // unique tail
    }
    val expected = Map(1L -> 600L, 2L -> 400L, 3L -> 240L)
    for (parts <- Seq(1, 7, 32)) {
      val df = s.sparkContext.parallelize(rows, parts).toDF("k")
      val got = ScaleOps.heavyHitters(df, "k", supportDenom = 10)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"parts=$parts")
    }
    // tighter support drops the 11% key, keeps 30% and 20%
    val got5 = ScaleOps.heavyHitters(
      s.sparkContext.parallelize(rows, 13).toDF("k"), "k", supportDenom = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got5 == Map(1L -> 600L, 2L -> 400L))
  }

  test("heavyHitters counts a hot NULL key instead of crashing, and " +
      "emits it as NULL") {
    // 40% NULL keys (a classic skew source) + a 30% hot key + unique tail
    val rows: Seq[java.lang.Long] = (0 until 1000).map { i =>
      if (i % 10 < 4) null
      else if (i % 10 < 7) java.lang.Long.valueOf(7L)
      else java.lang.Long.valueOf(5000L + i)
    }
    val df = rows.toDF("k")
    val got = ScaleOps.heavyHitters(df, "k", supportDenom = 5)
      .collect().map(r =>
        (if (r.isNullAt(0)) None else Some(r.getLong(0))) -> r.getLong(1))
      .toMap
    assert(got == Map(None -> 400L, Some(7L) -> 300L))
  }
}
