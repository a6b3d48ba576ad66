package graft.streaming

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming inverted-index ingest: stream ≡ recompute, a replayed
  * micro-batch (the exactly-once failure mode BM25's derived globals
  * would amplify — n_docs and every df inflate on a double-count) is a
  * no-op, and the served plan partition-prunes the `tb=` token buckets
  * across batch partials, before and after compaction. */
class Bm25StreamSuite extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  private def ingest(root: String, splits: Int): Unit = {
    val s = TestSpark.spark
    val docs = Tables.documents(s, sf).select(col("doc_id"), col("text"))
    (0 until splits).foreach { b =>
      Bm25Stream.processBatch(docs.filter(expr(s"doc_id % $splits = $b")),
        b.toLong, s"$root/p", s"$root/l", s"$root/st")
    }
  }

  test("streamed index serves exactly the full-corpus recompute") {
    val s = TestSpark.spark
    assert(rows(SparkEntry.queries("s_bm25_index")(s, sf)) ==
      rows(SparkEntry.queries("q_bm25_topk")(s, sf)))
  }

  test("partials compact without changing what the index serves; the " +
      "served scan prunes tb= buckets before and after") {
    val s = TestSpark.spark
    val root = java.nio.file.Files.createTempDirectory("bm25_compact").toString
    ingest(root, 3)
    def servedPlan: String = {
      val df = Bm25Stream.serveFrom(s, s"$root/p", s"$root/st")
      df.queryExecution.executedPlan.toString
    }
    // the postings scan partition-prunes to the query terms' buckets —
    // across every batch= partial in one discovery
    assert("PartitionFilters: \\[[^\\]]*tb#[^\\]]*\\]".r
      .findFirstIn(servedPlan).isDefined, servedPlan.linesIterator
      .filter(_.contains("PartitionFilters")).mkString("\n"))
    val before = rows(Bm25Stream.serveFrom(s, s"$root/p", s"$root/st"))
    assert(IndexCompaction.compact(s, s"$root/p") == 3)
    assert(IndexCompaction.compact(s, s"$root/l") == 3)
    assert(IndexCompaction.compact(s, s"$root/st") == 3)
    assert(rows(Bm25Stream.serveFrom(s, s"$root/p", s"$root/st")) == before)
    // compaction re-applied the internal tb= scheme — pruning survives
    assert("PartitionFilters: \\[[^\\]]*tb#[^\\]]*\\]".r
      .findFirstIn(servedPlan).isDefined, servedPlan.linesIterator
      .filter(_.contains("PartitionFilters")).mkString("\n"))
  }

  test("replaying a micro-batch is a no-op (batch= overwrite discipline)") {
    val s = TestSpark.spark
    val root = java.nio.file.Files.createTempDirectory("bm25_replay").toString
    val docs = Tables.documents(s, sf).select(col("doc_id"), col("text"))
    val (b0, b1) = (docs.filter(expr("doc_id % 2 = 0")),
      docs.filter(expr("doc_id % 2 = 1")))
    Bm25Stream.processBatch(b0, 0L, s"$root/p", s"$root/l", s"$root/st")
    Bm25Stream.processBatch(b1, 1L, s"$root/p", s"$root/l", s"$root/st")
    val before = rows(Bm25Stream.serveFrom(s, s"$root/p", s"$root/st"))
    // crash-replay of batch 1: same data, same id — must rewrite, never
    // double-count (postings, doclens AND the stats partial)
    Bm25Stream.processBatch(b1, 1L, s"$root/p", s"$root/l", s"$root/st")
    val after = rows(Bm25Stream.serveFrom(s, s"$root/p", s"$root/st"))
    assert(after == before)
    assert(before == rows(graft.operators.LlmQueries.bm25Rank(docs,
      "doc_id", "text", Seq("table", "window", "agg"), k = 15)))
  }
}
