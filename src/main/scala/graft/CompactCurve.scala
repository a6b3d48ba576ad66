package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.{DedupStream, IdSidecar, IndexCompaction}

/** Compaction-schedule measurement (r15): turn the tiered verb's
  * write-amplification argument into numbers on the REAL index layout.
  *
  * The claim under test: keeping a streaming index's run count bounded
  * with the monolithic [[graft.streaming.IndexCompaction.compact]]
  * every K batches charges an amortized O(index/K) rewrite per batch —
  * cumulative O(N²/K) over a corpus's lifetime, with each invocation a
  * corpus-sized barrier — while [[graft.streaming.IndexCompaction
  * .compactTiered]] bounds every merge to `fanIn` similar-sized runs,
  * for cumulative O(N·log_fanIn N) and a largest-single-rewrite that
  * grows only with the top tier reached, never jumps to the corpus.
  *
  * Method: ingest the SAME batch sequence (documents split by
  * `doc_id % nBatches`, the ScaleCurve history discipline) through
  * [[graft.streaming.DedupStream.processBatch]] into two independent
  * roots — the full production layout: `bb=`-partitioned band store +
  * `ib=`-partitioned `_ids` sidecar + pair log. After each batch,
  * schedule A runs the monolithic fold every `everyK` batches
  * (keepNewest=1, the replay guard) and schedule B runs the tiered fold
  * (same guard) every batch — a no-op unless a tier reached fan-in.
  * Rewrite bytes are measured from the filesystem (data bytes of each
  * newly produced run), not estimated. The pair logs are left
  * uncompacted on both sides — identical by construction, outside the
  * comparison. End state is cross-checked: both indexes must serve the
  * same row multiset (count + per-column hash), so neither schedule
  * changed what any probe reads.
  *
  * Usage: `runMain graft.CompactCurve [nBatches] [everyK] [fanIn]
  * [outJson]` (defaults 48, 8, 4, COMPACTCURVE.json); corpus from
  * SPARK_GRAFT_SF_DIR (default sf0.1). Prints ONE JSON line with, per
  * schedule: compaction invocations, folds, cumulative rewrite bytes,
  * write amplification (rewritten / ingested), the largest single
  * rewrite, the final run count (the probe's file-listing bound), and
  * the time dimension — total compaction wall-seconds plus the longest
  * single maintenance pause (the barrier an ingestion pipeline stalls
  * behind; bytes are the portable metric, the local pause is its
  * wall-clock shadow at this scale).
  */
object CompactCurve {

  private def fsOf(s: SparkSession, dir: String) =
    new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Committed `batch=` run names under `dir` (empty when absent). */
  private def runs(s: SparkSession, dir: String): Set[String] = {
    val p = new Path(dir)
    val fs = fsOf(s, dir)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).iterator
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .map(_.getPath.getName).toSet
  }

  private def bytesOf(s: SparkSession, dir: String, names: Iterable[String]): Long = {
    val fs = fsOf(s, dir)
    names.iterator.map(n => IndexCompaction.dataBytes(fs, new Path(dir, n))).sum
  }

  /** Run `compaction` and return (bytes of runs it produced, produced
    * run count) — measured as the before/after run-set difference over
    * the index AND its `_ids` sidecar. */
  private def measured(s: SparkSession, idx: String)(compaction: => Unit)
      : (Long, Int) = {
    val side = IdSidecar.root(idx)
    val (b0, s0) = (runs(s, idx), runs(s, side))
    compaction
    val newIdx = runs(s, idx) -- b0
    val newSide = runs(s, side) -- s0
    (bytesOf(s, idx, newIdx) + bytesOf(s, side, newSide),
      newIdx.size + newSide.size)
  }

  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(48)
    val everyK = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val fanIn = args.drop(2).headOption.map(_.toInt).getOrElse(4)
    val outJson = args.drop(3).headOption.getOrElse("COMPACTCURVE.json")
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Session.build(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("graft_compactcurve")
      .toFile.getAbsolutePath
    val (idxM, prsM) = (s"$work/mono/index", s"$work/mono/pairs")
    val (idxT, prsT) = (s"$work/tier/index", s"$work/tier/pairs")

    val docs = Tables.spread(spark, Tables.documents(spark, base))
      .select(col("doc_id"), col("text"))
      .localCheckpoint() // one source materialization for 2×nBatches slices

    var ingested = 0L           // committed raw partial bytes (schedule-free)
    var monoRewritten = 0L; var monoMaxFold = 0L
    var monoInvocations = 0; var monoFolds = 0
    var monoSecs = 0.0; var monoMaxPause = 0.0
    var tierStats = IndexCompaction.TieredStats(0, 0, 0, 0L)
    var tierInvocations = 0
    var tierSecs = 0.0; var tierMaxPause = 0.0
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    (0 until nBatches).foreach { b =>
      val slice = docs.filter(col("doc_id") % nBatches === b)
      // both schedules ingest the identical slice; ingested bytes are
      // measured once on the monolithic side (the raw partials are
      // identical by construction)
      val (bIdx, bSide) = (runs(spark, idxM), runs(spark, IdSidecar.root(idxM)))
      DedupStream.processBatch(slice, b.toLong, "doc_id", "text",
        idxM, prsM, threshold = 0.5): Unit
      ingested += bytesOf(spark, idxM, runs(spark, idxM) -- bIdx) +
        bytesOf(spark, IdSidecar.root(idxM),
          runs(spark, IdSidecar.root(idxM)) -- bSide)
      DedupStream.processBatch(slice, b.toLong, "doc_id", "text",
        idxT, prsT, threshold = 0.5): Unit

      if ((b + 1) % everyK == 0) {
        monoInvocations += 1
        var bytes = 0L; var folds = 0
        val secs = timed {
          val r = measured(spark, idxM) {
            // one fold per STORE actually compacted (compact returns the
            // consumed-dir count, 0 = no-op) — the same merge-operation
            // metric as the tiered side's `folds`, not produced dirs
            if (IndexCompaction.compact(spark, idxM, keepNewest = 1) > 0)
              folds += 1
            if (IdSidecar.compact(spark, idxM, keepNewest = 1) > 0)
              folds += 1
          }
          bytes = r._1
        }
        monoSecs += secs
        monoMaxPause = math.max(monoMaxPause, secs)
        monoRewritten += bytes
        monoFolds += folds
        // each monolithic fold rewrites the whole accumulated store into
        // one run — the produced run IS the single-rewrite barrier
        monoMaxFold = math.max(monoMaxFold, bytes)
      }
      tierInvocations += 1
      val tSecs = timed {
        tierStats += IndexCompaction.compactTiered(spark, idxT,
          fanIn = fanIn, keepNewest = 1) +
          IndexCompaction.compactTiered(spark, IdSidecar.root(idxT),
            fanIn = fanIn, keepNewest = 1)
      }
      tierSecs += tSecs
      tierMaxPause = math.max(tierMaxPause, tSecs)
    }

    // end-state equivalence: both layouts serve the same row multiset —
    // the index AND the underscore-hidden `_ids` sidecar (a plain read
    // of the index root never sees the sidecar, and the sidecar gates
    // all future ingestion via the membership anti-join)
    def fingerprint(dir: String): (Long, BigDecimal) = {
      val df = spark.read.parquet(dir).drop("batch")
      val row = df.select(count(lit(1)),
        sum(xxhash64(df.columns.map(col): _*).cast("decimal(38,0)"))).head()
      (row.getLong(0), BigDecimal(row.getDecimal(1)))
    }
    val fpM = (fingerprint(idxM), fingerprint(IdSidecar.root(idxM)))
    val fpT = (fingerprint(idxT), fingerprint(IdSidecar.root(idxT)))
    require(fpM == fpT,
      s"schedules diverged: monolithic=$fpM tiered=$fpT")

    val monoRunCount = runs(spark, idxM).size +
      runs(spark, IdSidecar.root(idxM)).size
    val tierRunCount = runs(spark, idxT).size +
      runs(spark, IdSidecar.root(idxT)).size
    def amp(rewritten: Long): Double =
      if (ingested == 0L) 0.0
      else math.rint(rewritten * 100.0 / ingested) / 100.0
    def sec(v: Double): Double = math.rint(v * 1000.0) / 1000.0

    val json =
      s"""{"metric":"compact_schedule","unit":"bytes","sf":"${base.split('/').last}",""" +
      s""""batches":$nBatches,"every_k":$everyK,"fan_in":$fanIn,""" +
      s""""ingested_bytes":$ingested,"rows":${fpM._1._1},""" +
      s""""monolithic":{"invocations":$monoInvocations,"folds":$monoFolds,""" +
      s""""rewritten_bytes":$monoRewritten,"write_amplification":${amp(monoRewritten)},""" +
      s""""max_single_rewrite":$monoMaxFold,"final_runs":$monoRunCount,""" +
      s""""compact_sec":${sec(monoSecs)},"max_pause_sec":${sec(monoMaxPause)}},""" +
      s""""tiered":{"invocations":$tierInvocations,"folds":${tierStats.folds},""" +
      s""""rewritten_bytes":${tierStats.bytesRewritten},""" +
      s""""write_amplification":${amp(tierStats.bytesRewritten)},""" +
      s""""max_single_rewrite":${tierStats.maxFoldBytes},""" +
      s""""final_runs":$tierRunCount,""" +
      s""""compact_sec":${sec(tierSecs)},"max_pause_sec":${sec(tierMaxPause)}}}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      json.getBytes("UTF-8")): Unit
    spark.stop()
  }
}
