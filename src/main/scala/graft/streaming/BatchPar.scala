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
  * then the FIRST failure rethrows on the calling thread — foreachBatch
  * fails the batch and the replay rewrites all lanes, committed or not.
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
    val firstError =
      new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    val threads = lanes.zipWithIndex.map { case (lane, i) =>
      val t = new Thread(
        () => try lane() catch {
          case e: Throwable => firstError.compareAndSet(null, e): Unit
        },
        s"graft-batch-par-$i")
      t.setDaemon(true)
      t.start()
      t
    }
    threads.foreach(_.join())
    val e = firstError.get()
    if (e != null) throw e
  }
}
