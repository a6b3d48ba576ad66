package graft.streaming

import org.apache.spark.sql.functions._

import graft.Session

/** Phase profiler for the `s_cluster_labels` gate (r16; reworked r17 —
  * the r16 verdict's What's-wrong #3: phases were timed in a separate
  * warm direct pass, so `direct_total` could overrun `gate_total` and
  * the "stream_scaffolding" residual went NEGATIVE — indicative, not
  * additive).
  *
  * Now the phases are attributed INSIDE the gated run: [[PhaseClock]]
  * timers sit on [[ClusterStream.processBatch]]'s real foreachBatch
  * path (signature materialization, the bb-pruned probe + ib verify,
  * the pair-log write, the index append, the label advance) and on the
  * gate's quiesce-time contraction; the serving collect is timed here.
  * Every phase second is nested inside the gate's wall clock by
  * construction. Since r18's [[BatchPar]] lanes, the pairs_write +
  * label_advance chain and the index_append phase run CONCURRENTLY, so
  * Σ phases can legitimately exceed the wall and
  * `scaffolding = gate_total − Σ phases` can go NEGATIVE — it now
  * reads as (trigger/checkpoint overhead − wall-clock won by overlap),
  * not as pure scaffolding. Per-phase numbers stay exact (each timer
  * wraps its own lane).
  *
  * Usage: `runMain graft.streaming.PhaseLabelGate [sfDir] [outJson]`
  * (defaults /root/testdata/sf0.1, PHASE_LABELGATE.json). Run it alone
  * on a quiet box — these are wall-clock phase shares. */
object PhaseLabelGate {

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outJson = args.drop(1).headOption.getOrElse("PHASE_LABELGATE.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.build(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.TextHash.ensureRegistered(spark)

    // warm-up gate run: populates the fixture's cached batch files and
    // the JVM, so the measured run below prices the steady gate, not
    // first-run fixture writes + codegen warmup
    ClusterStream.sClusterLabels(spark, sf).collect(): Unit

    // measured run: the REAL gate with in-run phase attribution
    val phases = scala.collection.mutable.LinkedHashMap[String, Double]()
    // scoped to the gate's own label root: a concurrent stream (or a
    // suite sharing the session) can never co-mingle its phase seconds
    // into this profile (r17 ADVICE)
    PhaseClock.install(ClusterStream.gateLabelsDir(sf), phases)
    val tGate0 = System.nanoTime()
    val served = ClusterStream.sClusterLabels(spark, sf)
    val t0 = System.nanoTime()
    served.collect(): Unit
    phases.synchronized {
      phases.update("serve",
        phases.getOrElse("serve", 0.0) + (System.nanoTime() - t0) / 1e9)
    }
    val gateSec = (System.nanoTime() - tGate0) / 1e9
    PhaseClock.uninstall()

    def s3(v: Double) = math.rint(v * 1000.0) / 1000.0
    val phasedSec = phases.values.sum
    val phaseJson = phases.map { case (k, v) => s""""$k":${s3(v)}""" }
      .mkString(",")
    val json =
      s"""{"metric":"phase_label_gate","unit":"sec","sf":"${sf.split('/').last}",""" +
      s""""phases":{$phaseJson},"phased_total":${s3(phasedSec)},""" +
      s""""gate_total":${s3(gateSec)},""" +
      s""""stream_scaffolding":${s3(gateSec - phasedSec)}}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      json.getBytes("UTF-8")): Unit
    spark.stop()
  }
}
