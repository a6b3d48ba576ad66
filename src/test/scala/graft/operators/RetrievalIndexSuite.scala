package graft.operators

import graft.{SparkEntry, TestSpark, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Maintained-BM25 semantics: the derived-globals argument (df, n_docs,
  * total_dl are additive counts, so merged state scores exactly like a
  * recompute) checked in-engine against the from-text path. */
class RetrievalIndexSuite extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("increment ≡ full-corpus recompute, bit for bit") {
    val s = TestSpark.spark
    val inc = rows(SparkEntry.queries("q_bm25_increment")(s, sf))
    val full = rows(SparkEntry.queries("q_bm25_topk")(s, sf))
    assert(inc == full)
  }

  test("takedown ≡ recompute over survivors, bit for bit") {
    val s = TestSpark.spark
    val ret = rows(SparkEntry.queries("q_bm25_retract")(s, sf))
    val surv = rows(LlmQueries.bm25Rank(
      Tables.spread(s, Tables.documents(s, sf))
        .filter(expr("doc_id % 7 <> 3")),
      "doc_id", "text", Seq("table", "window", "agg"), k = 15))
    assert(ret == surv)
    // the takedown moved the scores: survivors' idf shifts when n_docs
    // falls, so even an untouched document's score changes
    val full = rows(SparkEntry.queries("q_bm25_topk")(s, sf))
    assert(ret != full, "takedown was invisible — fixture too small?")
  }
}
