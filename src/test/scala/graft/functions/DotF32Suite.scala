package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `dot_f32` must be bit-identical to the higher-order composition it
  * replaces (same pairing/widening/accumulation order), across both the
  * interpreted and codegen evaluation paths, with zip_with's null
  * semantics on mismatched lengths. */
class DotF32Suite extends AnyFunSuite {
  private val s = TestSpark.spark

  private val hof =
    "aggregate(zip_with(a, b, (x, y) -> cast(x AS double) * cast(y AS double)), cast(0.0 AS double), (acc, v) -> acc + v)"

  test("bit-identical to the aggregate(zip_with(...)) composition") {
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map { i =>
      val n = 1 + rnd.nextInt(96)
      (Array.fill(n)(rnd.nextFloat() * 2 - 1), Array.fill(n)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("a", "b")
      .selectExpr("dot_f32(a, b) AS fast", s"$hof AS ref")
      .collect()
    df.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("null and length-mismatch semantics") {
    import s.implicits._
    val df = Seq(
      (Some(Array(1f, 2f)), Some(Array(3f, 4f))),   // 11.0
      (None, Some(Array(1f))),                      // null in → null out
      (Some(Array(1f, 2f)), Some(Array(1f))),       // length mismatch → null
      (Some(Array.empty[Float]), Some(Array.empty[Float]))) // empty → 0.0
      .toDF("a", "b")
      .selectExpr("dot_f32(a, b) AS d").collect()
    assert(df(0).getDouble(0) == 11.0)
    assert(df(1).isNullAt(0))
    assert(df(2).isNullAt(0))
    assert(df(3).getDouble(0) == 0.0)
  }

  test("null ELEMENT yields null, matching the composition's propagation") {
    // x*null = null and acc+null = null in aggregate(zip_with(...)), so a
    // null slot must poison the whole dot product — not read as 0.
    val df = s.sql(
      s"""SELECT dot_f32(a, b) AS fast, $hof AS ref FROM VALUES
         |  (array(cast(1 AS float), cast(NULL AS float)), array(cast(3 AS float), cast(4 AS float))),
         |  (array(cast(1 AS float), cast(2 AS float)), array(cast(NULL AS float), cast(4 AS float))),
         |  (array(cast(NULL AS float)), array(cast(NULL AS float))),
         |  (array(cast(1 AS float), cast(2 AS float)), array(cast(3 AS float), cast(4 AS float)))
         |  AS t(a, b)""".stripMargin).collect()
    assert(df(0).isNullAt(0) && df(0).isNullAt(1))
    assert(df(1).isNullAt(0) && df(1).isNullAt(1))
    assert(df(2).isNullAt(0) && df(2).isNullAt(1))
    assert(df(3).getDouble(0) == 11.0 && df(3).getDouble(1) == 11.0)
  }

  test("interpreted eval matches codegen (forced via filter on non-deterministic barrier)") {
    // Exercise the expression's eval() directly, then compare with the
    // SQL (codegen) result on the same input.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    val a = new GenericArrayData(Array(0.5f, -1.25f, 3f))
    val b = new GenericArrayData(Array(2f, 4f, -0.5f))
    val e = DotF32(
      Literal(a, ArrayType(FloatType)), Literal(b, ArrayType(FloatType)))
    val interpreted = e.eval(null).asInstanceOf[Double]
    assert(interpreted == 0.5 * 2 + -1.25 * 4 + 3 * -0.5)
    import s.implicits._
    val viaSql = Seq((Array(0.5f, -1.25f, 3f), Array(2f, 4f, -0.5f)))
      .toDF("a", "b").selectExpr("dot_f32(a, b)").head().getDouble(0)
    assert(viaSql == interpreted)
  }

  test("rejects wrong input types at analysis") {
    import s.implicits._
    val err = intercept[Exception] {
      Seq((Array(1.0, 2.0), Array(1.0))).toDF("a", "b")
        .selectExpr("dot_f32(a, b)").head()
    }
    assert(err.getMessage.toLowerCase.contains("dot_f32"))
  }
}
