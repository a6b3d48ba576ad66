package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.{ClusterStream, IndexCompaction}

/** The CORPUS-SIZE-SCALING leg of the label-contraction measurement
  * (r17 — the r16 verdict's top ask): [[LabelCurve]] scales BATCHES at
  * a fixed corpus, so the label state never grows enough to dramatize
  * the schedules' difference — at that point the incremental schedule
  * is strictly worse on wall-clock (it buys bounded pauses with 4-8×
  * write amplification, and the bound never binds on a tiny state).
  * The claim that justifies the amplification is about SCALE: the
  * monolithic contraction's pause grows with the accumulated label
  * state (its fold IS the state), while the incremental schedule's
  * worst pause is bounded by what one fold may consume — `fanIn`
  * below-ceiling runs, ≤ fanIn × maxRunBytes bytes — regardless of
  * corpus size. This tool holds the batch count FIXED and scales the
  * corpus 1×/4×/16×, publishing per size and schedule the max pause,
  * the max bytes any single INVOCATION rewrote, and the max bytes any
  * single FOLD rewrote ([[IndexCompaction.TieredStats.maxFoldBytes]] —
  * the r16 verdict's missing metric: the per-invocation runs-diff can
  * span several folds, so it cannot be compared to the per-fold bound).
  *
  * Corpus scaling: copy k of the documents table shifts ids by
  * k·10⁷ and suffixes EVERY token with `_c<k>`, so copies share no
  * shingles — no cross-copy pairs, the merge topology replicates
  * per copy, and the label state grows linearly in the scale factor
  * (clean scaling, not a denser pair graph).
  *
  * Schedules, per scale (the [[LabelCurve]] loops verbatim):
  * monolithic = [[ClusterStream.compactState]] every `everyK` batches;
  * incremental = [[ClusterStream.compactStateTiered]](fanIn, ceiling) +
  * [[ClusterStream.refreshState]](1) after every batch, backlog
  * drained at the end. End states are fingerprint-checked equal.
  *
  * Usage: `runMain graft.LabelCurveScale [scales] [nBatches] [everyK]
  * [fanIn] [outJson] [maxRunKb]` (defaults "1,4,16", 24, 8, 4,
  * LABELCURVE_SCALE.json, 64). Corpus from SPARK_GRAFT_SF_DIR
  * (default sf0.1). Run alone on a quiet box. Prints ONE JSON line. */
object LabelCurveScale {

  private def fsOf(s: SparkSession, dir: String) =
    new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def runs(s: SparkSession, dir: String): Set[String] = {
    val p = new Path(dir)
    val fs = fsOf(s, dir)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).iterator
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .map(_.getPath.getName).toSet
  }

  private def bytesOf(s: SparkSession, dir: String,
      names: Iterable[String]): Long = {
    val fs = fsOf(s, dir)
    names.iterator
      .map(n => IndexCompaction.dataBytes(fs, new Path(dir, n))).sum
  }

  /** Per-schedule counters; measure() wraps one maintenance invocation
    * and records wall seconds plus the delta-run-set byte diff; the
    * body reports the max bytes any single FOLD inside it wrote (the
    * TieredStats metric; for single-fold verbs the runs-diff itself). */
  private final class Leg(spark: SparkSession, deltaDir: String) {
    var invocations = 0
    var secs = 0.0
    var maxPause = 0.0
    var rewritten = 0L
    var maxRewrite = 0L
    var maxFold = 0L
    def measure(body: => Long): Unit = {
      val b0 = runs(spark, deltaDir)
      val t0 = System.nanoTime()
      val foldBytes = body
      val t = (System.nanoTime() - t0) / 1e9
      val newRuns = runs(spark, deltaDir) -- b0
      val bytes = bytesOf(spark, deltaDir, newRuns)
      invocations += 1
      secs += t
      maxPause = math.max(maxPause, t)
      rewritten += bytes
      maxRewrite = math.max(maxRewrite, bytes)
      maxFold = math.max(maxFold, if (foldBytes >= 0L) foldBytes else bytes)
    }
    def json: String = {
      def sec(v: Double): Double = math.rint(v * 1000.0) / 1000.0
      s"""{"invocations":$invocations,"compact_sec":${sec(secs)},""" +
      s""""max_pause_sec":${sec(maxPause)},"rewritten_bytes":$rewritten,""" +
      s""""max_single_rewrite":$maxRewrite,"max_fold_bytes":$maxFold}"""
    }
  }

  def main(args: Array[String]): Unit = {
    val scales = args.headOption.getOrElse("1,4,16")
      .split(",").map(_.trim.toInt).toSeq
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(24)
    val everyK = args.drop(2).headOption.map(_.toInt).getOrElse(8)
    val fanIn = args.drop(3).headOption.map(_.toInt).getOrElse(4)
    val outJson = args.drop(4).headOption.getOrElse("LABELCURVE_SCALE.json")
    val maxRunBytes = args.drop(5).headOption
      .map(_.toLong * 1024L).getOrElse(64L * 1024L)
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

    val legsJson = scales.map { m =>
      val docs = scaledCorpus(m)
      val nRows = docs.count()
      val work = java.nio.file.Files
        .createTempDirectory(s"graft_lcs_x$m").toFile.getAbsolutePath
      val mono = (s"$work/mono/i", s"$work/mono/p", s"$work/mono/l")
      val inc = (s"$work/inc/i", s"$work/inc/p", s"$work/inc/l")
      val monoLeg = new Leg(spark, s"${mono._3}/delta")
      val incLeg = new Leg(spark, s"${inc._3}/delta")

      (0 until nBatches).foreach { b =>
        val slice = docs.filter(col("doc_id") % nBatches === b)
        ClusterStream.processBatch(slice, b.toLong, "doc_id", "text",
          mono._1, mono._2, mono._3, threshold = 0.5)
        ClusterStream.processBatch(slice, b.toLong, "doc_id", "text",
          inc._1, inc._2, inc._3, threshold = 0.5)
        if ((b + 1) % everyK == 0)
          monoLeg.measure {
            ClusterStream.compactState(spark, mono._3): Unit
            -1L // single fold: the runs-diff IS the per-fold bytes
          }
        incLeg.measure {
          val st = ClusterStream.compactStateTiered(spark, inc._3, fanIn,
            maxRunBytes)
          // The refresh's in-place rewrite (up to fanIn × maxRunBytes —
          // it refolds ONE run that may itself be a prior fanIn-fold's
          // output) must reach the per-fold metric: TieredStats only
          // covers the tiered merges, and returning it alone would
          // silence the runs-diff fallback (r17 ADVICE). Diff the run
          // set around the refresh call ALONE — one run rewritten, so
          // the diff IS its bytes — and max it with the tiered folds'.
          val mid = runs(spark, s"${inc._3}/delta")
          ClusterStream.refreshState(spark, inc._3, maxRuns = 1): Unit
          val refreshBytes = bytesOf(spark, s"${inc._3}/delta",
            runs(spark, s"${inc._3}/delta") -- mid)
          math.max(st.maxFoldBytes, refreshBytes)
        }
      }
      // drain the incremental refresh backlog (quiesced cadence) —
      // still one bounded run per invocation
      var draining = true
      while (draining)
        incLeg.measure {
          val (refreshed, _) = ClusterStream.refreshState(spark, inc._3, 1)
          draining = refreshed > 0
          -1L
        }

      // end-state equivalence, per scale
      def fingerprint(dir: String): (Long, BigDecimal) = {
        val df = ClusterStream.clusterLabels(spark, dir)
        val row = df.select(count(lit(1)),
          sum(xxhash64(df.columns.map(col).toSeq: _*)
            .cast("decimal(38,0)"))).head()
        (row.getLong(0), BigDecimal(row.getDecimal(1)))
      }
      val fpM = fingerprint(mono._3)
      val fpI = fingerprint(inc._3)
      require(fpM == fpI,
        s"schedules diverged at scale $m: monolithic=$fpM incremental=$fpI")

      val stateBytes = bytesOf(spark, s"${inc._3}/delta",
        runs(spark, s"${inc._3}/delta"))
      val monoStateBytes = bytesOf(spark, s"${mono._3}/delta",
        runs(spark, s"${mono._3}/delta"))
      System.err.println(s"[labelcurve_scale] x$m rows=$nRows " +
        s"mono_max_pause=${monoLeg.maxPause} inc_max_pause=${incLeg.maxPause} " +
        s"mono_max_fold=${monoLeg.maxFold} inc_max_fold=${incLeg.maxFold}")
      s"""{"scale":$m,"rows":$nRows,"label_state_bytes":$stateBytes,""" +
      s""""mono_state_bytes":$monoStateBytes,""" +
      s""""monolithic":${monoLeg.json},"incremental":${incLeg.json}}"""
    }

    val json =
      s"""{"metric":"label_contraction_scale","unit":"sec",""" +
      s""""sf":"${base.split('/').last}","batches":$nBatches,""" +
      s""""every_k":$everyK,"fan_in":$fanIn,"max_run_bytes":$maxRunBytes,""" +
      s""""fold_bound_bytes":${fanIn.toLong * maxRunBytes},""" +
      s""""legs":[${legsJson.mkString(",")}]}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      json.getBytes("UTF-8")): Unit
    spark.stop()
  }
}
