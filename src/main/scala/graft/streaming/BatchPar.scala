package graft.streaming

/** Overlap INDEPENDENT per-batch state actions on the foreachBatch path
  * (r18 — guide §2.6 "overlap independent jobs"): at micro-batch scale
  * the maintenance gates are fixed-job-count-dominated (JobCensus r18:
  * the label gate runs ~63 jobs per batch averaging ~50 ms each plus a
  * ~40 ms driver gap between consecutive jobs — the job CONSTANT, not
  * the data, is the cost), and the batch step's tail is a strictly
  * sequential chain of actions the driver submits one at a time. But the
  * chain is only PARTLY ordered: the pair-log write, the index append,
  * and the label advance touch DISJOINT roots, so Spark's scheduler can
  * run them as concurrent jobs and back-fill each other's stragglers —
  * actions are only sequential because the driver calls them
  * sequentially.
  *
  * Safety argument, per lane pair the callers submit:
  *  - every write is a `batch=<id>`-keyed OVERWRITE to a root no other
  *    lane touches, so lane interleaving cannot change any file content,
  *    and a crash with any subset of lanes committed is exactly the
  *    crash window the replay contract already covers (the replay
  *    rewrites every lane's partial verbatim — reads exclude the current
  *    batch id regardless of which lanes committed);
  *  - every READ a lane executes was CONSTRUCTED before the fork
  *    (`spark.read.parquet` captures its file listing and schema at
  *    construction), so a concurrent lane ADDING a `batch=` directory to
  *    a root another lane scans can never enter that scan's file index —
  *    the probe frames are materialized, and the one cross-root read on
  *    the label path (the advance re-reading the committed pair partial)
  *    stays INSIDE the lane that wrote it;
  *  - ordered sub-steps (alias before delta, band store before sidecar)
  *    stay inside one lane, sequential as before.
  *
  * Error contract: every lane runs to completion (a half-submitted lane
  * set would leave Spark jobs racing the stream's failure handling),
  * then the FIRST failure rethrows on the calling thread — with any
  * later lanes' failures attached via `addSuppressed` — and foreachBatch
  * fails the batch; the replay rewrites all lanes, committed or not.
  *
  * Interrupt contract (r19 — the r18 `sbt test` shutdown crash): the
  * join loop is UNINTERRUPTIBLE. An interrupt of the calling thread
  * (stream stop, suite teardown) must not orphan still-running lanes —
  * a leaked lane keeps submitting parquet writes past SparkSession /
  * JVM shutdown (the observed `SparkShutdownHookManager` crash over an
  * in-flight `FileFormatWriter` job). On interrupt we forward the
  * interrupt to every lane thread (so a lane blocked in an
  * interruptible Spark wait aborts promptly), KEEP joining until all
  * lanes have exited, and only then restore the caller's interrupt flag.
  * Lanes are non-daemon so an in-flight write blocks JVM exit instead
  * of racing it.
  *
  * Plain threads, one per lane (lanes are 2-3 driver-side action chains;
  * a pool would outlive the batch and pin its inherited thread-locals).
  * Spark job submission is thread-safe and FIFO-scheduled — the later
  * lane's tasks back-fill cores as the earlier lane's stages drain
  * (guide §2.6). */
private[graft] object BatchPar {

  def run(lanes: (() => Unit)*): Unit = {
    require(lanes.nonEmpty, "BatchPar.run: no lanes")
    if (lanes.lengthCompare(1) == 0) { lanes.head.apply(); return }
    val errors =
      new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = lanes.zipWithIndex.map { case (lane, i) =>
      val t = new Thread(
        () => try lane() catch {
          case e: Throwable => errors.add(e): Unit
        },
        s"graft-batch-par-$i")
      t.setDaemon(false)
      t.start()
      t
    }
    // Uninterruptible join: never return (or throw) with a lane still
    // running. On interrupt, forward it to the lanes and keep waiting.
    var interrupted = false
    threads.foreach { t =>
      var joined = false
      while (!joined) {
        try { t.join(); joined = true }
        catch {
          case _: InterruptedException =>
            interrupted = true
            threads.foreach(_.interrupt())
        }
      }
    }
    if (interrupted) Thread.currentThread().interrupt()
    val it = errors.iterator()
    if (it.hasNext) {
      val first = it.next()
      while (it.hasNext) first.addSuppressed(it.next())
      throw first
    }
  }
}
