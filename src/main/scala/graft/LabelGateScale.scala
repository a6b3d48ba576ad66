package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.ClusterStream

/** The LABEL GATE'S end-to-end corpus-size scaling leg (r18 — r17
  * verdict #7): SCALECURVE pins the BM25 family's serve/ingest
  * flatness and LABELCURVE_SCALE pins the contraction schedules, but
  * the claim that closed the r16→r17 label-gate performance thread —
  * "the gate's cost is per-batch FIXED job count, so the constants
  * amortize as the corpus grows" — carried no measurement of its own.
  * This tool is that measurement: the `s_cluster_labels` batch loop
  * (the real [[ClusterStream.processBatch]] + a per-batch
  * [[graft.api.Graft.maintain]] tick — the auto-tick schedule the
  * builder declares) run at corpus ×1/×4/×16 with the batch COUNT
  * fixed at 4, reporting per scale the median per-batch wall, the
  * serve wall, and their ratio to rows.
  *
  * What amortization predicts (and the stamp shows): per-batch wall
  * grows far SLOWER than 16× across a 16× corpus — the fixed
  * scheduling constants (writes, bucket collects, closure rounds)
  * dominate at ×1 and dilute as real per-row work grows — so
  * sec-per-row falls monotonically with scale. A per-batch wall
  * tracking rows 1:1 would refute the claim.
  *
  * Corpus scaling is [[LabelCurveScale]]'s copy-shift: copy k shifts
  * ids by k·10⁷ and suffixes every token `_c<k>`, so copies share no
  * shingles, the merge topology replicates per copy, and state grows
  * linearly — clean scaling, not a denser pair graph.
  *
  * Usage: `runMain graft.LabelGateScale [scales] [outJson]` (defaults
  * "1,4,16", LABELGATE_SCALE.json). Corpus from SPARK_GRAFT_SF_DIR
  * (default sf0.1). Run alone on a quiet box. Prints ONE JSON line. */
object LabelGateScale {

  def main(args: Array[String]): Unit = {
    val scales = args.headOption.getOrElse("1,4,16")
      .split(",").map(_.trim.toInt).toSeq
    val outJson = args.drop(1).headOption.getOrElse("LABELGATE_SCALE.json")
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Session.build(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")

    val docs0 = Tables.spread(spark, Tables.documents(spark, base))
      .select(col("doc_id"), col("text"))

    def scaledCorpus(m: Int): DataFrame = (0 until m).map { k =>
      if (k == 0) docs0
      else docs0.select(
        (col("doc_id") + lit(k * 10000000L)).as("doc_id"),
        expr(s"array_join(transform(split(text, ' '), " +
          s"t -> concat(t, '_c$k')), ' ')").as("text"))
    }.reduce(_ unionByName _).localCheckpoint()

    def sec(v: Double): Double = math.rint(v * 1000.0) / 1000.0

    val legs = scales.map { m =>
      val docs = scaledCorpus(m)
      val nRows = docs.count()
      val work = java.nio.file.Files
        .createTempDirectory(s"graft_lgs_x$m").toFile.getAbsolutePath
      val (idx, prs, lbl) = (s"$work/i", s"$work/p", s"$work/l")
      // the gate's schedule: 4 deterministic batches, a bounded
      // maintain() tick after every one (the builder auto-tick)
      val batchSecs = (0 until 4).map { b =>
        val slice = docs.filter(col("doc_id") % 4 === b)
        val t0 = System.nanoTime()
        ClusterStream.processBatch(slice, b.toLong, "doc_id", "text",
          idx, prs, lbl, threshold = 0.5)
        graft.api.Graft.maintain(spark,
          indexRoots = Seq(idx, prs), labelDirs = Seq(lbl),
          policy = graft.api.Graft.MaintenancePolicy(fanIn = 2)): Unit
        (System.nanoTime() - t0) / 1e9
      }
      val t1 = System.nanoTime()
      val served = ClusterStream.clusterLabels(spark, lbl).count()
      val serveSec = (System.nanoTime() - t1) / 1e9
      val med = batchSecs.sorted.apply(batchSecs.size / 2)
      System.err.println(s"[labelgate_scale] x$m rows=$nRows " +
        s"batch_med=${sec(med)} serve=${sec(serveSec)} served=$served")
      s"""{"scale":$m,"rows":$nRows,"served":$served,""" +
        s""""batch_secs":[${batchSecs.map(sec).mkString(",")}],""" +
        s""""batch_median_sec":${sec(med)},""" +
        s""""serve_sec":${sec(serveSec)},""" +
        s""""batch_us_per_row":${sec(med * 4e6 / nRows)}}"""
    }

    val json =
      s"""{"metric":"label_gate_scale","unit":"sec",""" +
        s""""sf":"${base.split('/').last}","batches":4,""" +
        s""""legs":[${legs.mkString(",")}]}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      json.getBytes("UTF-8")): Unit
    spark.stop()
  }
}
