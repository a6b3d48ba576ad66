package graft.streaming

/** Opt-in phase attribution INSIDE a gated (checkpointed-stream) run —
  * the r16 profiler timed phases in a separate warm direct pass, which
  * let `direct_total` overrun `gate_total` (a negative "scaffolding"
  * residual; the decomposition was only indicative). With the timers on
  * the real foreachBatch path, phase seconds are nested inside the gate
  * wall by construction, so the residual (gate − Σphases) is the genuine
  * streaming scaffolding and can never go negative.
  *
  * The sink is SCOPED to one installation's label root (r17 ADVICE):
  * the timers are compiled into [[ClusterStream.processBatch]]
  * unconditionally, so a JVM-global sink would co-mingle phase seconds
  * from any OTHER stream that runs while a profile is active (a
  * concurrent gate, a suite sharing the session) and break the
  * phases-nest-inside-the-gate-wall invariant. Each timed site passes
  * its own `labelsDir`; only the installation the profiler named
  * accumulates.
  *
  * Off by default: one volatile read per phase when no sink is
  * installed — nothing on the hot path. Install/uninstall from the
  * profiler thread only ([[PhaseLabelGate]]); accumulation is
  * synchronized because foreachBatch runs on the stream-execution
  * thread. */
private[streaming] object PhaseClock {

  @volatile private var sink:
      Option[(String, scala.collection.mutable.LinkedHashMap[String, Double])] =
    None

  /** Install a sink for the installation rooted at `scope` (its
    * labelsDir — the one dir every profiled phase site has in hand). */
  def install(scope: String,
      m: scala.collection.mutable.LinkedHashMap[String, Double]): Unit =
    sink = Some((scope, m))

  def uninstall(): Unit = sink = None

  def timed[T](scope: String, name: String)(body: => T): T = sink match {
    case Some((sc, m)) if sc == scope =>
      val t0 = System.nanoTime()
      val r = body
      val dt = (System.nanoTime() - t0) / 1e9
      m.synchronized {
        m.update(name, m.getOrElse(name, 0.0) + dt)
      }
      r
    case _ => body
  }
}
