package graft.streaming

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[EnrichStream]] — the stateless stream-static enrichment: parity with
  * the batch join, exactly-once replay, and the plan pins that it runs
  * with ZERO state stores (no watermark, no join state — the static side
  * is fully known) and a broadcast hash join per micro-batch. */
class EnrichStreamSuite extends AnyFunSuite {
  private val s = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed enrichment == batch join; images from rolled-back txns " +
      "pass through (stateless — rollback filtering is s_stream_join's job)") {
    val got = EnrichStream.queries("s_enrich")(s, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getString(4), r.getString(5)))
    val want = Tables.events(s, sf)
      .join(Tables.customer(s, sf),
        col("user_id") === col("c_custkey"))
      .select((col("event_id") * 4 + 2).as("seq"), col("user_id"),
        col("event_type"), col("value"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("seq"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getString(4), r.getString(5)))
    assert(got.length == want.length && got.sameElements(want))
    // rolled-back txns' images ARE here (event_id 100-119 => txid 5)
    assert(got.exists { case (seq, _, _, _, _, _) =>
      (seq - 2) / 4 / 20 % 13 == 5 })
  }

  test("stateless: the stream runs with no state operators, and re-running " +
      "over the same checkpoint emits nothing new") {
    val root = new java.io.File("/tmp/graft_enrich_spec/stateless")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(root); root.mkdirs()
    val chunkDir = new java.io.File(root, "chunks")
    CdcPipeline.recordFixtureCached(s, sf, chunkDir.getAbsolutePath,
      ordered = true)
    val ck = new java.io.File(root, "ck").getAbsolutePath
    val out = new java.io.File(root, "out").getAbsolutePath
    val q = EnrichStream.enrich(s, chunkDir.getAbsolutePath,
      Tables.customer(s, sf), ck, out)
    q.awaitTermination()
    val stateOps = q.recentProgress.flatMap(_.stateOperators)
    assert(stateOps.isEmpty,
      s"expected a stateless plan, got state operators: ${stateOps.map(_.operatorName).toSet}")
    val n1 = s.read.parquet(out).count()
    // Replay over the same checkpoint: AvailableNow finds no new files —
    // exactly-once means the output is byte-stable.
    val q2 = EnrichStream.enrich(s, chunkDir.getAbsolutePath,
      Tables.customer(s, sf), ck, out)
    q2.awaitTermination()
    assert(s.read.parquet(out).count() == n1)
  }

  test("plan pin: each micro-batch joins with a broadcast hash join " +
      "(the stream side never shuffles)") {
    val root = new java.io.File("/tmp/graft_enrich_spec/planpin")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(root); root.mkdirs()
    val chunkDir = new java.io.File(root, "chunks")
    CdcPipeline.recordFixtureCached(s, sf, chunkDir.getAbsolutePath,
      ordered = true)
    val q = EnrichStream.enrich(s, chunkDir.getAbsolutePath,
      Tables.customer(s, sf),
      new java.io.File(root, "ck").getAbsolutePath,
      new java.io.File(root, "out").getAbsolutePath)
    q.awaitTermination()
    val plan = q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
      .streamingQuery.lastExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      plan.linesIterator.take(12).mkString("\n"))
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }
}
