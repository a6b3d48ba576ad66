package graft

import org.apache.spark.sql.DataFrame

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Harness rules (VERDICT r1 fixes):
  *  - deterministic query order (sorted by name);
  *  - queries are materialized via the `noop` datasource, not `count()` —
  *    count() lets Catalyst eliminate the final sort and skip column
  *    materialization, under-measuring the real work;
  *  - a failing query is recorded as -1 and the process exits non-zero, so
  *    a regression can never *improve* the bench total;
  *  - each query runs THREE timed repetitions — FIVE when the median is
  *    sub-second (r13) — and reports the per-query MEDIAN (VERDICT r5
  *    #7): single-shot timings on a shared box swing ±30%
  *    round-over-round, which repeatedly muddied the perf trend; the
  *    median drops one-off GC/scheduling outliers while staying cheap,
  *    and the extra reps on short queries squeeze the residual ±25%
  *    relative jitter their small absolute times are exposed to. The
  *    reported total is the sum of medians.
  *
  * Per-query isolation (VERDICT r12 #3): every query gets a FRESH
  * SparkContext. r8's in-place cleanup (clearCache + unpersist +
  * System.gc) was not enough — ContextCleaner drains asynchronously, so
  * under a 128 GiB heap that rarely GCs, block-manager entries, shuffle
  * files and broadcast state still accumulated across ~760 executions,
  * and ten untouched queries swung 1.5–2.4× between r11 and r12 while
  * fresh-JVM ProfileQ showed no code regression. A measurement that
  * swings ±2× can hide a real 2× regression. The restart resets
  * block-manager / shuffle / broadcast state to exactly what a per-job
  * cluster submission starts from; the JVM's JIT and the static codegen
  * cache survive the restart, so one untimed warm rep after each restart
  * (executions per query: 1 warm + 3 timed, or 1 + 5 for the sub-second
  * cohort) restores the warm state the old global warm-up pass
  * provided — without the shared-fate pollution. Restart cost (~0.5 s × |queries|) is untimed wall-clock,
  * never part of any rep.
  */
object Bench {
  private def run(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    var failed = List.empty[String]
    val Reps = 3
    // Sub-second queries get 5 reps instead of 3 (r13): with ~0.2-0.5 s
    // medians, box-scheduling jitter of ±0.05-0.1 s is a ±25% relative
    // swing that median-of-3 passes through one time in four — the resi-
    // dual noise after the fresh-context isolation fix. Median-of-5 needs
    // two outliers on the same side to move, and the extra reps cost
    // ~2 min across the ~150 short queries; long queries keep 3 reps
    // (their absolute jitter is already below 15%).
    val ExtraReps = 2
    val ShortSec = 1.0
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val results = ordered.map { case (name, fn) =>
      val spark = Session.build(s"local[$cpus]", cpus)
      spark.sparkContext.setLogLevel("WARN")
      // warm rep: JIT + codegen-cache + parquet footer warmth, untimed
      // (a failure here is ignored; the timed pass records and reports it)
      try run(fn(spark, sfDir)) catch { case _: Throwable => () }
      def timed(n: Int): IndexedSeq[Double] = (1 to n).flatMap { _ =>
        val t0 = System.nanoTime()
        try { run(fn(spark, sfDir)); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          None
        }
      }
      var times = timed(Reps)
      var want = Reps
      if (times.length == Reps && times.sorted.apply(Reps / 2) < ShortSec) {
        times = times ++ timed(ExtraReps)
        want = Reps + ExtraReps
      }
      if (times.length < want) failed ::= name
      try spark.stop() catch { case _: Throwable => () }
      // median (or -1 if any rep failed — a flaky query is a failure)
      name -> (if (times.length == want) times.sorted.apply(want / 2) else -1.0)
    }
    // 3-decimal timings (VERDICT r6 #7): the driver captures a bounded tail
    // of stdout, and full-precision doubles made the one JSON line long
    // enough to truncate its head. 1 ms resolution is below box variance.
    // Locale.ROOT: the f interpolator uses the default locale, and a
    // comma-decimal locale would make the JSON line unparseable.
    def fmt(v: Double): String =
      if (v < 0) "-1"
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // VERDICT r8 #8: the driver's tail window is 2000 chars INCLUDING sbt's
    // [success] trailer; ~100 query names alone are ~1400 chars, so no
    // per-entry compression can make the full {"name":sec} map fit. The
    // printed line therefore carries (a) the contract "queries" map for the
    // 12 slowest (headline) queries and (b) "qv": ALL per-query medians as a
    // JSON array in sorted-query-name order — the name list is exactly the
    // sorted key set of CORRECTNESS_r{N}.json, so zip(sorted(names), qv)
    // reconstructs the full map. The complete old-format line is also
    // written to bench_full.json in the working directory.
    val fullQs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val fullLine = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$fullQs,"sf":"$sfDir","failed":${failed.size}}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_full.json"),
      (fullLine + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] bench_full.json write failed (ignored): ${e.getMessage}")
    }
    val headline = results.filter(_._2 >= 0).sortBy(-_._2).take(12)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val qv = results.map { case (_, v) => fmt(v) }.mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$headline,"qv":$qv,"qn":${results.size},"sf":"$sfDir","failed":${failed.size}}"""
    // Every per-query session is already stopped, so the one JSON line
    // sits at the tail of the captured output (only sbt's [success]
    // trailer follows it in the driver's tail window).
    println(line)
    if (failed.nonEmpty) sys.exit(1)
  }
}
