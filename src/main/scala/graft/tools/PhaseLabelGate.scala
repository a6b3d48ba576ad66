package graft.streaming

import org.apache.spark.sql.functions._

import graft.operators.{LlmQueries, Materialize}
import graft.{Session, Tables}

/** Phase profiler for the `s_cluster_labels` gate (r16 — the r15
  * verdict's watch item #2: the gate carries a real ~+8 s per-batch
  * constant bought by the bucketed layout; name WHERE it goes).
  *
  * Replays the gate's exact 4-batch fixture TWICE:
  *  1. DIRECTLY through [[ClusterStream.processBatch]]'s phases, each
  *     timed per batch — signature materialization, the bb-pruned
  *     probe (+ ib verify), the pair-log write, the index append
  *     (membership lookup + bb band fan + sidecar), and the label
  *     advance (endpoint lookup + contraction + alias/delta writes) —
  *     plus the quiesce-time contraction and the serving read;
  *  2. through the REAL gate (checkpointed stream), whose total minus
  *     the direct total is the streaming scaffolding (trigger,
  *     checkpoint, offset log, stream-source listing) — the floor no
  *     layout change can move.
  *
  * Usage: `runMain graft.streaming.PhaseLabelGate [sfDir] [outJson]`
  * (defaults /root/testdata/sf0.1, PHASE_LABELGATE.json). Run it
  * alone on a quiet box — these are wall-clock phase shares. */
object PhaseLabelGate {

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outJson = args.drop(1).headOption.getOrElse("PHASE_LABELGATE.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.build(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.TextHash.ensureRegistered(spark)

    val work = java.nio.file.Files.createTempDirectory("graft_phase")
      .toFile.getAbsolutePath
    val (idx, prs, lbl) = (s"$work/i", s"$work/p", s"$work/l")

    val docs = Tables.spread(spark, Tables.documents(spark, sf))
      .select(col("doc_id"), col("text")).localCheckpoint()

    // warm-up gate run: populates the fixture's cached batch files and
    // the JVM, so the measured run below prices the steady gate, not
    // first-run fixture writes + codegen warmup
    ClusterStream.sClusterLabels(spark, sf).collect(): Unit

    val phases = scala.collection.mutable.LinkedHashMap[String, Double]()
      .withDefaultValue(0.0)
    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      phases(name) += (System.nanoTime() - t0) / 1e9
      r
    }

    val tDirect0 = System.nanoTime()
    (0 until 4).foreach { b =>
      val batch = Materialize(
        docs.filter(expr(s"(doc_id div 4) % 4 = $b")))
      // phase 1: one text pass — shingle + minhash, materialized
      val sigx = timed("sig_materialize") {
        LlmQueries.minhashMaterialized(batch, "doc_id", "text")
      }
      // phase 2: bb-pruned collision probe + ib-pruned Jaccard verify
      val pairs = timed("probe") {
        DedupStream.probePairs(spark, idx, "doc_id", sigx, 0.5, b.toLong)
      }
      // phase 3: the flat pair-log partial
      timed("pairs_write") {
        pairs.select(col("doc_a"), col("doc_b"))
          .write.mode("overwrite").parquet(s"$prs/batch=$b")
      }
      // phase 4a: the sidecar membership lookup alone (re-run so its
      // share inside the append is visible; bounded metadata)
      timed("membership_lookup") {
        IdSidecar.knownIds(spark, idx, "doc_id",
          sigx.select("doc_id"), b.toLong).count(): Unit
      }
      // phase 4: index append — membership anti-join + bb= band fan +
      // ib= sidecar partial (the file-commit fan lives here)
      timed("index_append") {
        DedupStream.appendIndex(sigx, "doc_id", idx, b.toLong,
          exclude = sigx.select("doc_id").limit(0))
      }
      // phase 5: label advance — lb-pruned endpoint lookup, O(batch)
      // contraction, alias + delta partials
      timed("label_advance") {
        LabelLog.advance(spark, lbl, b.toLong,
          Materialize(batch.select(col("doc_id").as("id")).distinct()),
          spark.read.parquet(s"$prs/batch=$b")
            .select(col("doc_a").as("e1"), col("doc_b").as("e2")))
      }
    }
    timed("contraction") {
      ClusterStream.compactState(spark, lbl): Unit
    }
    timed("serve") {
      ClusterStream.clusterLabels(spark, lbl).orderBy(col("doc_id"))
        .collect(): Unit
    }
    // membership_lookup is an EXTRA diagnostic run (the real lookup is
    // inside index_append) — keep it out of the direct total
    val directSec =
      (System.nanoTime() - tDirect0) / 1e9 - phases("membership_lookup")

    // the real gate: its total minus the direct phases is the
    // streaming scaffolding (trigger/checkpoint/offset machinery)
    val tGate0 = System.nanoTime()
    ClusterStream.sClusterLabels(spark, sf).collect(): Unit
    val gateSec = (System.nanoTime() - tGate0) / 1e9

    def s3(v: Double) = math.rint(v * 1000.0) / 1000.0
    val phaseJson = phases.map { case (k, v) => s""""$k":${s3(v)}""" }
      .mkString(",")
    val json =
      s"""{"metric":"phase_label_gate","unit":"sec","sf":"${sf.split('/').last}",""" +
      s""""phases":{$phaseJson},"direct_total":${s3(directSec)},""" +
      s""""gate_total":${s3(gateSec)},""" +
      s""""stream_scaffolding":${s3(gateSec - directSec)}}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      json.getBytes("UTF-8")): Unit
    spark.stop()
  }
}
