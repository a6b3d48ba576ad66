package graft.streaming

import graft.{SparkEntry, TestSpark}
import graft.operators.PersistedVectorIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The driver-checked streaming ANN-index leg (`s_ann_index`): an index
  * CREATED with the batch build's trained vocabularies and MAINTAINED by
  * [[VectorIndexStream]] must equal the batch-built
  * [[PersistedVectorIndex]] row for row — clusters, norms, AND residual
  * PQ codes — and serve `q_ann_persisted`'s funnel identically. This is
  * the contract that lets one oracle string check both forms. */
class AnnIndexStreamSuite extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  test("streamed serve equals the batch-built q_ann_persisted funnel") {
    val s = TestSpark.spark
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSeq
    assert(rows(SparkEntry.queries("s_ann_index")(s, sf)) ==
      rows(SparkEntry.queries("q_ann_persisted")(s, sf)))
  }

  test("streamed index rows equal the batch build's — clusters, norms, " +
      "and all PQ codes (vocabulary identity carried through the stream)") {
    val s = TestSpark.spark
    // s_ann_index has just run (or runs now) — its state dir is keyed by
    // the sf dir and the stream rewrites per run, so invoke it to ensure
    // the state exists, then compare layouts.
    SparkEntry.queries("s_ann_index")(s, sf).collect()
    val streamedDir =
      s"/tmp/graft_stream_ann/${sf.replaceAll("[^A-Za-z0-9.]", "_")}/index"
    val cols = Seq("vec_id", "label", "norm", "cluster") ++
      (0 until PersistedVectorIndex.M).map(i => s"code$i")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.map(c => col(c).cast("string")): _*)
        .collect().map(_.toString).sorted.toSeq
    val streamed = rows(VectorIndexStream.readIndex(s, streamedDir))
    val batch = rows(s.read.parquet(PersistedVectorIndex.ensure(s, sf)))
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("plan pin: the funnel's probe prunes the streamed batch=/cluster= " +
      "layout to the probed cluster directories") {
    val s = TestSpark.spark
    SparkEntry.queries("s_ann_index")(s, sf).collect()
    val streamedDir =
      s"/tmp/graft_stream_ann/${sf.replaceAll("[^A-Za-z0-9.]", "_")}/index"
    val idx = s.read.parquet(streamedDir) // batch= and cluster= partitions
    val pruned = idx.filter(col("cluster").isin(0, 1))
    val p = pruned.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cluster#[^\\]]*\\]".r
      .findFirstIn(p).isDefined,
      p.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
  }

  test("replaying a micro-batch id is a no-op on the streamed layout") {
    val s = TestSpark.spark
    SparkEntry.queries("s_ann_index")(s, sf).collect()
    val root = s"/tmp/graft_stream_ann/${sf.replaceAll("[^A-Za-z0-9.]", "_")}"
    val streamedDir = s"$root/index"
    def state() = VectorIndexStream.readIndex(s, streamedDir)
      .collect().map(_.toString).sorted.toSeq
    val before = state()
    // re-run one batch file through processBatch under the id it
    // actually carried (file→trigger order isn't contractual, so read
    // it back from the state): the batch= overwrite + stored
    // vocabularies must rewrite verbatim.
    val b2 = s.read.parquet(s"$root/vecs/b2")
    val bid = s.read.parquet(streamedDir)
      .join(b2.select(col("vec_id")), Seq("vec_id"), "left_semi")
      .select(col("batch").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq
    assert(bid.length == 1, s"b2 spread over batches $bid")
    VectorIndexStream.processBatch(b2, bid.head, "vec_id", "embedding",
      streamedDir, pqM = PersistedVectorIndex.M,
      pqK = PersistedVectorIndex.K)
    assert(state() == before)
  }
}
