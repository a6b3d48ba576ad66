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
  * provided — without the shared-fate pollution. Restart cost
  * (~0.5 s × |queries|) is untimed wall-clock, never part of any rep.
  *
  * Self-adjudication (VERDICT r13 #4 — the q_corr 5.7× phantom this
  * harness should have caught itself): every attempt records
  * /proc/loadavg before and after its rep block, and a query whose
  * complete rep set still spreads more than 1.5× max/min AND more than
  * 0.4 s max−min (co-tenant pressure the median can't fully reject
  * when multiple reps are hit; the absolute term keeps the ~150
  * sub-second queries' milliseconds-scale jitter from firing it)
  * is re-run ONCE in another fresh SparkContext; the attempt with the
  * lower median wins (box noise only ever inflates a timing, so the
  * lower median is the better estimate of the code's cost — it can
  * never manufacture a speedup that isn't reproducible on the box).
  * bench_full.json carries per-query reps + load context + which
  * attempt won; the compact driver line carries the retry count and the
  * run-level load bracket. */
object Bench {
  private def run(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** 1-minute load average — the per-rep-block context that separates
    * "the code got slower" from "the box was busy". -1 when the proc
    * interface is unavailable (non-Linux). */
  private def loadAvg(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.split(" ")(0).toDouble finally src.close()
    } catch { case _: Throwable => -1.0 }

  /** One complete measurement attempt in a fresh SparkContext: untimed
    * warm rep, then the 3-rep (or 3+2 sub-second) timed block, with the
    * load bracket around it. */
  private final case class Attempt(times: IndexedSeq[Double], want: Int,
      load0: Double, load1: Double) {
    def complete: Boolean = times.length == want
    def median: Double =
      if (complete) times.sorted.apply(want / 2) else -1.0
    def spread: Double =
      if (complete && times.min > 0) times.max / times.min
      else Double.PositiveInfinity
    def absSwing: Double =
      if (complete) times.max - times.min else Double.PositiveInfinity
  }

  private val Reps = 3
  // Sub-second queries get 5 reps instead of 3 (r13): with ~0.2-0.5 s
  // medians, box-scheduling jitter of ±0.05-0.1 s is a ±25% relative
  // swing that median-of-3 passes through one time in four — the resi-
  // dual noise after the fresh-context isolation fix. Median-of-5 needs
  // two outliers on the same side to move, and the extra reps cost
  // ~2 min across the ~150 short queries; long queries keep 3 reps
  // (their absolute jitter is already below 15%).
  private val ExtraReps = 2
  private val ShortSec = 1.0
  // A complete rep set spreading beyond this is adjudicated (one fresh
  // retry); chosen to sit above the ±25% residual jitter two-sided band
  // and below the 1.5-2.4× swings the r11→r12 pollution produced. The
  // ratio alone fires constantly on the ~150 sub-second queries (a
  // 0.15→0.25 s rep pair is a 1.7× "swing" worth 100 ms), so the gate
  // also requires a material ABSOLUTE swing — the phantoms this exists
  // for (q_corr 1.0→5.8 s, s_enrich 1.7→2.6 s) clear it by an order of
  // magnitude, while median-of-5 already protects the short cohort.
  private val SpreadGate = 1.5
  private val SpreadAbsSec = 0.4

  private def attempt(name: String, cpus: String, sfDir: String,
      fn: (org.apache.spark.sql.SparkSession, String) => DataFrame): Attempt = {
    val spark = Session.build(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")
    val l0 = loadAvg()
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
    val l1 = loadAvg()
    try spark.stop() catch { case _: Throwable => () }
    Attempt(times, want, l0, l1)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    var failed = List.empty[String]
    val runLoad0 = loadAvg()
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val results = ordered.map { case (name, fn) =>
      val first = attempt(name, cpus, sfDir, fn)
      // Adjudicate an outlier spread with ONE fresh-context retry; the
      // lower median wins (noise inflates, never deflates). BOTH
      // attempts are kept for bench_full.json — min-of-two-medians is
      // biased low under symmetric noise, so the losing attempt (the
      // evidence the adjudication acted on) must stay auditable.
      val (best, attempts) =
        if (first.complete && first.spread > SpreadGate &&
            first.absSwing > SpreadAbsSec) {
          System.err.println(f"[bench] $name spread ${first.spread}%.2f× " +
            f"(load ${first.load0}%.1f→${first.load1}%.1f) — retrying once")
          val second = attempt(name, cpus, sfDir, fn)
          if (second.complete && second.median < first.median)
            (second, Seq(first, second))
          else (first, Seq(first, second))
        } else (first, Seq(first))
      if (!best.complete) failed ::= name
      (name, best, attempts)
    }
    def fmt(v: Double): String =
      if (v < 0) "-1"
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // 3-decimal timings (VERDICT r6 #7): the driver captures a bounded tail
    // of stdout, and full-precision doubles made the one JSON line long
    // enough to truncate its head. 1 ms resolution is below box variance.
    // Locale.ROOT: the f interpolator uses the default locale, and a
    // comma-decimal locale would make the JSON line unparseable.
    val medians = results.map { case (name, a, _) => name -> a.median }
    val total = medians.collect { case (_, v) if v >= 0 => v }.sum
    val nRetried = results.count(_._3.size > 1)
    val runLoad1 = loadAvg()
    // VERDICT r8 #8: the driver's tail window is 2000 chars INCLUDING sbt's
    // [success] trailer; ~100 query names alone are ~1400 chars, so no
    // per-entry compression can make the full {"name":sec} map fit. The
    // printed line therefore carries (a) the contract "queries" map for the
    // 12 slowest (headline) queries and (b) "qv": ALL per-query medians as a
    // JSON array in sorted-query-name order — the name list is exactly the
    // sorted key set of CORRECTNESS_r{N}.json, so zip(sorted(names), qv)
    // reconstructs the full map. The complete line — now including each
    // query's raw reps, its before/after 1-min loadavg bracket, and
    // whether the retry adjudicator fired — goes to bench_full.json in
    // the working directory.
    val fullQs = medians.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val detail = results.map { case (name, a, attempts) =>
      // On a retry, "attempts" carries BOTH rep blocks + load brackets
      // (first = the flagged attempt, second = the retry) and "winner"
      // names the index the reported median came from — the
      // adjudication is auditable after the fact.
      val adjudicated =
        if (attempts.size > 1)
          ",\"retried\":1,\"attempts\":" + attempts.map(x =>
            "{\"reps\":" + x.times.map(fmt).mkString("[", ",", "]") +
              ",\"load\":[" + fmt(x.load0) + "," + fmt(x.load1) + "]}")
            .mkString("[", ",", "]") +
            ",\"winner\":" + attempts.indexWhere(_ eq a)
        else ""
      "\"" + name + "\":{\"reps\":" +
        a.times.map(fmt).mkString("[", ",", "]") +
        ",\"load\":[" + fmt(a.load0) + "," + fmt(a.load1) + "]" +
        adjudicated + "}"
    }.mkString("{", ",", "}")
    val fullLine = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$fullQs,"detail":$detail,"retried":$nRetried,"run_load":[${fmt(runLoad0)},${fmt(runLoad1)}],"sf":"$sfDir","failed":${failed.size}}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_full.json"),
      (fullLine + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] bench_full.json write failed (ignored): ${e.getMessage}")
    }
    val headline = medians.filter(_._2 >= 0).sortBy(-_._2).take(12)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val qv = medians.map { case (_, v) => fmt(v) }.mkString("[", ",", "]")
    // "rt" = retry-adjudicator fire count, deliberately terse: the
    // driver's tail window is 2000 chars and qv alone is ~1.2 KB — a
    // truncated HEAD makes the whole line unparseable, so every compact
    // byte counts (run_load and per-query detail live in bench_full.json).
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$headline,"qv":$qv,"qn":${medians.size},"rt":$nRetried,"sf":"$sfDir","failed":${failed.size}}"""
    // Every per-query session is already stopped, so the one JSON line
    // sits at the tail of the captured output (only sbt's [success]
    // trailer follows it in the driver's tail window).
    println(line)
    if (failed.nonEmpty) sys.exit(1)
  }
}
