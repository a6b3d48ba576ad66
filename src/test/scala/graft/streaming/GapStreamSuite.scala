package graft.streaming

import graft.{Tables, TestSpark}
import graft.operators.AuditOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[GapStream]] — online sequence-continuity monitoring: the streamed
  * gap set must equal the batch lead-window audit exactly, the plan must
  * actually carry flatMapGroupsWithState state, and a checkpoint replay
  * must emit nothing new. */
class GapStreamSuite extends AnyFunSuite {
  private val s = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed gaps == the batch lead-window gap set") {
    val got = GapStream.streamedGaps(s, sf)
      .orderBy("event_type", "gap_start")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // Batch recompute with the same lead-pair definition.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("event_id"))
    val want = Tables.events(s, sf)
      .select(col("event_type"), col("event_id"))
      .withColumn("_nxt", lead(col("event_id"), 1).over(w))
      .filter(col("_nxt") > col("event_id") + 1)
      .select(col("event_type"), (col("event_id") + 1).as("gs"),
        (col("_nxt") - 1).as("ge"))
      .orderBy("event_type", "gs")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length === want.length)
    assert(got.sameElements(want))
    assert(got.nonEmpty) // the interleaved fixture must actually have gaps
  }

  test("report aggregation equals the batch q_seq_gaps operator") {
    val got = GapStream.queries("s_seq_gaps")(s, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val want = AuditOps.seqGaps(Tables.events(s, sf))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.sameElements(want))
  }

  test("stateful monitor: state operator present; replay emits nothing new") {
    val root = new java.io.File("/tmp/graft_gaps_spec/replay")
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
    val q = GapStream.monitor(s, chunkDir.getAbsolutePath, ck, out)
    q.awaitTermination()
    val stateOps = q.recentProgress.flatMap(_.stateOperators)
    assert(stateOps.exists(_.operatorName.contains("flatMapGroupsWithState")),
      stateOps.map(_.operatorName).mkString(", "))
    val n1 = s.read.parquet(out).count()
    // Re-run over the same checkpoint: everything is already committed.
    val q2 = GapStream.monitor(s, chunkDir.getAbsolutePath, ck, out)
    q2.awaitTermination()
    assert(s.read.parquet(out).count() === n1)
  }
}
