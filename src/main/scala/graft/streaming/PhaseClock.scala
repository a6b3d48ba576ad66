package graft.streaming

/** Opt-in phase attribution INSIDE a gated (checkpointed-stream) run —
  * the r16 profiler timed phases in a separate warm direct pass, which
  * let `direct_total` overrun `gate_total` (a negative "scaffolding"
  * residual; the decomposition was only indicative). With the timers on
  * the real foreachBatch path, phase seconds are nested inside the gate
  * wall by construction, so the residual (gate − Σphases) is the genuine
  * streaming scaffolding and can never go negative.
  *
  * Off by default: one volatile read per phase when no sink is
  * installed — nothing on the hot path. Install/uninstall from the
  * profiler thread only ([[PhaseLabelGate]]); accumulation is
  * synchronized because foreachBatch runs on the stream-execution
  * thread. */
private[streaming] object PhaseClock {

  @volatile private var sink:
      Option[scala.collection.mutable.LinkedHashMap[String, Double]] = None

  def install(m: scala.collection.mutable.LinkedHashMap[String, Double]): Unit =
    sink = Some(m)

  def uninstall(): Unit = sink = None

  def timed[T](name: String)(body: => T): T = sink match {
    case None => body
    case Some(m) =>
      val t0 = System.nanoTime()
      val r = body
      val dt = (System.nanoTime() - t0) / 1e9
      m.synchronized {
        m.update(name, m.getOrElse(name, 0.0) + dt)
      }
      r
  }
}
