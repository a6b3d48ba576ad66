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

  test("driver-side bucketOf equals the write side's pmod(crc32(token), B) " +
      "over adversarial token shapes — the pruned read's correctness hinge") {
    // The read path prunes to buckets computed DRIVER-side (java CRC32)
    // while the write path buckets with Spark's crc32 expression; any
    // divergence silently empties query results for the affected terms,
    // so the agreement is pinned over random ASCII, multi-byte UTF-8,
    // empty, whitespace and long tokens (seeded — reproducible).
    val s = TestSpark.spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val tokens = (Seq("", "a", " ", "tab\tle", "naïve", "日本語", "emoji🙂",
      "x" * 300) ++
      (1 to 300).map(_ => rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString) ++
      (1 to 100).map(_ => (1 to (1 + rnd.nextInt(6)))
        .map(_ => (0x20 + rnd.nextInt(0x2500)).toChar).mkString)).distinct
    val got = tokens.toDF("token")
      .withColumn("tb", pmod(crc32(col("token")),
        lit(RetrievalIndex.Buckets.toLong)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    tokens.foreach { t =>
      assert(got(t) == RetrievalIndex.bucketOf(t).toLong,
        s"bucket mismatch for codepoints ${t.map(_.toInt).mkString(",")}")
    }
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
