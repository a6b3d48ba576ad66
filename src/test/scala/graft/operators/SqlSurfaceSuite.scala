package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Two frontends, ONE engine: the SQL-text queries must return exactly
  * what their DataFrame-API twins return — same schema, same rows, same
  * order. The CORRECTNESS gate already holds both against the same
  * DuckDB oracle text; this suite pins the stronger in-engine statement
  * directly (bit-identical results from either frontend), so a kernel
  * registration or SQL-path regression can't hide behind oracle
  * tolerance. */
class SqlSurfaceSuite extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.queries(name)(TestSpark.spark, sf)

  private def assertSameResult(sqlName: String, dfName: String): Unit = {
    val a = run(sqlName)
    val b = run(dfName)
    assert(a.schema.map(f => (f.name, f.dataType)) ==
      b.schema.map(f => (f.name, f.dataType)),
      s"$sqlName schema != $dfName schema:\n${a.schema}\n${b.schema}")
    val ra = a.collect().toSeq
    val rb = b.collect().toSeq
    assert(ra == rb, s"$sqlName rows != $dfName rows " +
      s"(${ra.size} vs ${rb.size}); first diff: " +
      ra.zip(rb).find { case (x, y) => x != y }.fold("size")(_.toString))
  }

  test("q_sql_vector returns exactly q_cosine_topk's result") {
    assertSameResult("q_sql_vector", "q_cosine_topk")
  }

  test("q_sql_sample returns exactly q_sample_agg's result") {
    assertSameResult("q_sql_sample", "q_sample_agg")
  }
}
