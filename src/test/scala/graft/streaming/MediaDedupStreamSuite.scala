package graft.streaming

import graft.{SparkEntry, TestSpark}
import graft.multimodal.MultimodalOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Continuous multimodal near-dup maintenance: stream ≡ the
  * q_media_near_dup recompute, corrupt payloads quarantine at ingest
  * (never entering the index), cross-batch twins pair when the later
  * one arrives, replay is a no-op, and the probe's index read prunes to
  * the batch's mb buckets. */
class MediaDedupStreamSuite extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  test("streamed pair log equals the full-corpus q_media_near_dup " +
      "recompute") {
    val s = TestSpark.spark
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSeq
    assert(rows(SparkEntry.queries("s_media_index")(s, sf)) ==
      rows(SparkEntry.queries("q_media_near_dup")(s, sf)))
  }

  private def step(rows: Seq[(Long, Array[Byte])], id: Long,
      root: String): Unit = {
    val s = TestSpark.spark
    import s.implicits._
    MediaDedupStream.processBatch(rows.toDF("doc_id", "payload"), id,
      "doc_id", "payload", MultimodalOps.dHashPgmE,
      s"$root/i", s"$root/p", s"$root/q")
  }

  test("cross-batch twins pair when the later arrives; corrupt payloads " +
      "quarantine with their reason and never enter the index") {
    val s = TestSpark.spark
    val root = java.nio.file.Files.createTempDirectory("media_stream").toString
    // ids 30 and 31 share base 3 (id div 10), 31 perturbing ONE pixel —
    // at most 2 dHash bits apart, within the maxHamming=2 verify; id 102
    // (%10=2) corrupts to a zero-length payload in corruptPayload.
    step(Seq((30L, MultimodalOps.syntheticNoisePgm(30L)),
      (102L, MultimodalOps.corruptPayload(102L))), 0L, root)
    step(Seq((31L, MultimodalOps.syntheticNoisePgm(31L))), 1L, root)
    val pairs = MediaDedupStream.readPairs(s, s"$root/p")
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((30L, 31L)), s"cross-batch twin pair missing: $pairs")
    val quarantined = MediaDedupStream.readQuarantine(s, s"$root/q")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(quarantined.keySet == Set(102L), quarantined)
    assert(s.read.parquet(s"$root/i").filter(col("doc_id") === 102L)
      .isEmpty, "quarantined payload leaked into the index")
  }

  test("replaying a micro-batch is a no-op across pairs, index, and " +
      "quarantine") {
    val s = TestSpark.spark
    val root = java.nio.file.Files.createTempDirectory("media_replay").toString
    step(Seq((30L, MultimodalOps.syntheticNoisePgm(30L))), 0L, root)
    val b1 = Seq((31L, MultimodalOps.syntheticNoisePgm(31L)),
      (106L, MultimodalOps.corruptPayload(106L)))
    step(b1, 1L, root)
    def state() = (
      MediaDedupStream.readPairs(s, s"$root/p").collect()
        .map(_.toString).sorted.toSeq,
      s.read.parquet(s"$root/i").drop("batch", "mb").collect()
        .map(_.toString).sorted.toSeq,
      MediaDedupStream.readQuarantine(s, s"$root/q").collect()
        .map(_.toString).sorted.toSeq)
    val before = state()
    step(b1, 1L, root) // crash-replay: same data, same id
    assert(state() == before)
  }

  test("plan pin: the probe's index read prunes to the batch's mb " +
      "buckets (PartitionFilters reach the scan)") {
    val s = TestSpark.spark
    val root = java.nio.file.Files.createTempDirectory("media_prune").toString
    step(Seq((30L, MultimodalOps.syntheticNoisePgm(30L)),
      (40L, MultimodalOps.syntheticNoisePgm(40L))), 0L, root)
    // the pruned read shape processBatch issues: mb IN (batch buckets)
    val probe = s.read.parquet(s"$root/i")
      .filter(col("batch") =!= 1L).filter(col("mb").isin(0, 1, 2))
    val p = probe.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*mb#[^\\]]*\\]".r.findFirstIn(p).isDefined,
      p.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
    // the first-write-wins membership read prunes on the sidecar's ib
    import TestSpark.spark.implicits._
    val ib30 = Seq(30L).toDF("x")
      .select(IdSidecar.bucket(col("x"), IdSidecar.Buckets)).head.getInt(0)
    val sidecar = IdSidecar.read(s, s"$root/i", Seq(ib30), 1L)
    val ps = sidecar.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*ib#[^\\]]*\\]".r.findFirstIn(ps).isDefined,
      ps.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
    // one sidecar row per decoded doc (never the 4-per-doc band rows)
    assert(sidecar.filter(col("doc_id") === 30L).count() == 1L)
  }
}
