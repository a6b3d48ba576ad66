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
    // The gate's /tmp state is FOLDED at quiesce since r17 (its batch
    // ids are gone into the consolidated run), so the replay claim —
    // batch= overwrite + stored vocabularies rewrite verbatim — is
    // exercised on a directly-built UNFOLDED stream layout, where
    // per-batch ids still exist to replay.
    SparkEntry.queries("s_ann_index")(s, sf).collect() // batch files cached
    val root = s"/tmp/graft_stream_ann/${sf.replaceAll("[^A-Za-z0-9.]", "_")}"
    val e = graft.Tables.embeddings(s, sf)
      .select(col("vec_id"), col("embedding"), col("label"))
    val idxDir = java.nio.file.Files
      .createTempDirectory("ann_replay").toString + "/index"
    VectorIndexStream.createIndex(e, "vec_id", "embedding", idxDir,
      pqM = PersistedVectorIndex.M, pqK = PersistedVectorIndex.K)
    (0 until 4).foreach { b =>
      VectorIndexStream.processBatch(s.read.parquet(s"$root/vecs/b$b"),
        b.toLong, "vec_id", "embedding", idxDir,
        pqM = PersistedVectorIndex.M, pqK = PersistedVectorIndex.K): Unit
    }
    def state() = VectorIndexStream.readIndex(s, idxDir)
      .collect().map(_.toString).sorted.toSeq
    val before = state()
    VectorIndexStream.processBatch(s.read.parquet(s"$root/vecs/b2"), 2L,
      "vec_id", "embedding", idxDir, pqM = PersistedVectorIndex.M,
      pqK = PersistedVectorIndex.K): Unit
    assert(state() == before)
    // and on the FOLDED layout the same replay is guarded by keepNewest
    // in the live tick path — the gate's quiesce fold is terminal by
    // contract (the stream has ended; nothing replays into it).
  }
}
