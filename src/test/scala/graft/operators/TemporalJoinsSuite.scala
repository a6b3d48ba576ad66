package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AsOfJoin semantics on crafted frames: latest-at-or-before selection,
  * `>=` tie handling, left-outer nulls, and key isolation. */
class TemporalJoinsSuite extends AnyFunSuite {
  private val s = TestSpark.spark
  import s.implicits._

  private def run(left: Seq[(Long, Long)], right: Seq[(Long, Long, String)]) = {
    val l = left.toDF("k", "lts")
    val r = right.toDF("k", "rts", "tag")
    AsOfJoin.asOf(l, r, Seq("k"), "lts", "rts", Seq("tag"))
      .orderBy("k", "lts").collect()
      .map(row => (row.getLong(0), row.getLong(1),
        if (row.isNullAt(2)) null else row.getString(2))).toSeq
  }

  test("picks the latest right row at or before each left timestamp") {
    val got = run(
      left = Seq((1L, 5L), (1L, 20L), (1L, 100L)),
      right = Seq((1L, 3L, "a"), (1L, 10L, "b"), (1L, 50L, "c")))
    assert(got == Seq((1L, 5L, "a"), (1L, 20L, "b"), (1L, 100L, "c")))
  }

  test("equal timestamps match (>= semantics, like DuckDB ASOF)") {
    val got = run(left = Seq((1L, 10L)), right = Seq((1L, 10L, "same")))
    assert(got == Seq((1L, 10L, "same")))
  }

  test("left rows with no earlier right row keep null payload") {
    val got = run(
      left = Seq((1L, 2L), (2L, 9L)),
      right = Seq((1L, 5L, "late"), (3L, 1L, "other-key")))
    assert(got == Seq((1L, 2L, null), (2L, 9L, null)))
  }

  test("keys do not leak into each other") {
    val got = run(
      left = Seq((1L, 10L), (2L, 10L)),
      right = Seq((1L, 4L, "k1"), (2L, 6L, "k2")))
    assert(got == Seq((1L, 10L, "k1"), (2L, 10L, "k2")))
  }

  test("as-of composition has no join in the plan (single window pass)") {
    val l = Seq((1L, 5L)).toDF("k", "lts")
    val r = Seq((1L, 3L, "a")).toDF("k", "rts", "tag")
    val plan = AsOfJoin.asOf(l, r, Seq("k"), "lts", "rts", Seq("tag"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"),
      s"as-of should be union+window, not a join:\n$plan")
  }
}
