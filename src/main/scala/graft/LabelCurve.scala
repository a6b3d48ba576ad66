package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.{ClusterStream, IndexCompaction}

/** Label-contraction schedule measurement (r16): turn the INCREMENTAL
  * alias contraction's bounded-pause argument into numbers on the real
  * maintenance loop, the way [[CompactCurve]] did for the index folds.
  *
  * The claim under test: the monolithic contraction
  * ([[ClusterStream.compactState]] every K batches) clears the alias
  * log by folding EVERY non-newest delta partial at once — a pause
  * that grows with the accumulated label state — while the incremental
  * schedule (closure-applying tiered folds + one bounded run-refresh +
  * retirement per batch, [[ClusterStream.compactStateTiered]] /
  * [[ClusterStream.refreshState]]) clears it with no invocation ever
  * rewriting more than a tier's worth of runs, and the alias log held
  * at a small working set instead of growing until the next barrier.
  *
  * Method: ingest the SAME batch sequence (documents split by
  * `doc_id % nBatches`) through [[ClusterStream.processBatch]] into two
  * independent roots — the full production loop (signature index,
  * sidecar, pair log, label log). Schedule A (monolithic) runs
  * compactState every `everyK` batches; schedule B (incremental) runs
  * compactStateTiered + refreshState(1) after every batch. Per
  * maintenance invocation we record wall seconds and the delta-log
  * bytes it rewrote (filesystem-measured run-set diff — bytes are the
  * scale-portable metric; the local pause is its wall-clock shadow).
  * End states are cross-checked: both label logs must serve the same
  * labels (count + per-column hash), and the incremental side's alias
  * log must be CLEARED to its kept-newest working set without
  * compactState ever running.
  *
  * Usage: `runMain graft.LabelCurve [nBatches] [everyK] [fanIn]
  * [outJson] [maxRunKb]` (defaults 48, 8, 4, LABELCURVE.json, none);
  * corpus from SPARK_GRAFT_SF_DIR (default sf0.1). `maxRunKb` applies
  * the top-tier ceiling to the INCREMENTAL side only — the leg that
  * shows "max single rewrite bounded by the ceiling while aliases
  * still clear", the bound the monolithic contraction structurally
  * cannot offer (its rewrite IS the accumulated label state). Prints
  * ONE JSON line. */
object LabelCurve {

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

  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(48)
    val everyK = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val fanIn = args.drop(2).headOption.map(_.toInt).getOrElse(4)
    val outJson = args.drop(3).headOption.getOrElse("LABELCURVE.json")
    val maxRunBytes = args.drop(4).headOption
      .map(_.toLong * 1024L).getOrElse(Long.MaxValue)
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Session.build(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("graft_labelcurve")
      .toFile.getAbsolutePath
    val mono = (s"$work/mono/i", s"$work/mono/p", s"$work/mono/l")
    val inc = (s"$work/inc/i", s"$work/inc/p", s"$work/inc/l")

    val docs = Tables.spread(spark, Tables.documents(spark, base))
      .select(col("doc_id"), col("text"))
      .localCheckpoint()

    final class Leg {
      var invocations = 0
      var secs = 0.0
      var maxPause = 0.0
      var rewritten = 0L
      var maxRewrite = 0L
      var maxFold = 0L
      // body returns the max bytes any single FOLD inside it wrote
      // (TieredStats.maxFoldBytes — r17, the metric the per-invocation
      // runs-diff cannot stand in for: one invocation may span several
      // folds), or −1 for single-fold verbs where the runs-diff IS it.
      def measure(deltaDir: String)(body: => Long): Unit = {
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
    }
    val monoLeg = new Leg
    val incLeg = new Leg
    var incMaxAliases = 0

    (0 until nBatches).foreach { b =>
      val slice = docs.filter(col("doc_id") % nBatches === b)
      ClusterStream.processBatch(slice, b.toLong, "doc_id", "text",
        mono._1, mono._2, mono._3, threshold = 0.5)
      ClusterStream.processBatch(slice, b.toLong, "doc_id", "text",
        inc._1, inc._2, inc._3, threshold = 0.5)

      if ((b + 1) % everyK == 0)
        monoLeg.measure(s"${mono._3}/delta") {
          ClusterStream.compactState(spark, mono._3): Unit
          -1L // single fold: the runs-diff IS the per-fold bytes
        }
      incLeg.measure(s"${inc._3}/delta") {
        val st = ClusterStream.compactStateTiered(spark, inc._3, fanIn,
          maxRunBytes)
        // The refresh's in-place rewrite must reach the per-fold
        // metric: TieredStats only covers the tiered merges, and
        // returning it alone silences the runs-diff fallback (r17
        // ADVICE). Diff the run set around the refresh ALONE — one
        // run rewritten, so the diff IS its bytes — and max it in.
        val mid = runs(spark, s"${inc._3}/delta")
        ClusterStream.refreshState(spark, inc._3, maxRuns = 1): Unit
        val refreshBytes = bytesOf(spark, s"${inc._3}/delta",
          runs(spark, s"${inc._3}/delta") -- mid)
        math.max(st.maxFoldBytes, refreshBytes)
      }
      incMaxAliases = math.max(incMaxAliases,
        ClusterStream.aliasPartials(spark, inc._3))
    }
    // drain the incremental side's refresh backlog the way a quiesced
    // installation would — still one bounded run per invocation
    var draining = true
    while (draining)
      incLeg.measure(s"${inc._3}/delta") {
        val (refreshed, _) = ClusterStream.refreshState(spark, inc._3, 1)
        draining = refreshed > 0
        -1L
      }

    // end-state equivalence: identical served labels on both schedules
    def fingerprint(dir: String): (Long, BigDecimal) = {
      val df = ClusterStream.clusterLabels(spark, dir)
      val row = df.select(count(lit(1)),
        sum(xxhash64(df.columns.map(col).toSeq: _*)
          .cast("decimal(38,0)"))).head()
      (row.getLong(0), BigDecimal(row.getDecimal(1)))
    }
    val fpM = fingerprint(mono._3)
    val fpI = fingerprint(inc._3)
    require(fpM == fpI, s"schedules diverged: monolithic=$fpM incremental=$fpI")

    val monoAliases = runs(spark, s"${mono._3}/alias").size
    val incAliases = runs(spark, s"${inc._3}/alias").size
    val monoRuns = runs(spark, s"${mono._3}/delta").size
    val incRuns = runs(spark, s"${inc._3}/delta").size
    def sec(v: Double): Double = math.rint(v * 1000.0) / 1000.0

    val json =
      s"""{"metric":"label_contraction","unit":"sec","sf":"${base.split('/').last}",""" +
      s""""batches":$nBatches,"every_k":$everyK,"fan_in":$fanIn,"rows":${fpM._1},""" +
      (if (maxRunBytes == Long.MaxValue) ""
       else s""""max_run_bytes":$maxRunBytes,""") +
      s""""monolithic":{"invocations":${monoLeg.invocations},""" +
      s""""compact_sec":${sec(monoLeg.secs)},"max_pause_sec":${sec(monoLeg.maxPause)},""" +
      s""""rewritten_bytes":${monoLeg.rewritten},"max_single_rewrite":${monoLeg.maxRewrite},""" +
      s""""max_fold_bytes":${monoLeg.maxFold},""" +
      s""""final_alias_partials":$monoAliases,"final_delta_runs":$monoRuns},""" +
      s""""incremental":{"invocations":${incLeg.invocations},""" +
      s""""compact_sec":${sec(incLeg.secs)},"max_pause_sec":${sec(incLeg.maxPause)},""" +
      s""""rewritten_bytes":${incLeg.rewritten},"max_single_rewrite":${incLeg.maxRewrite},""" +
      s""""max_fold_bytes":${incLeg.maxFold},""" +
      s""""max_alias_partials":$incMaxAliases,"final_alias_partials":$incAliases,""" +
      s""""final_delta_runs":$incRuns}}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      json.getBytes("UTF-8")): Unit
    spark.stop()
  }
}
