package graft.streaming

/** Shared per-poll helpers for the streaming operators. */
private[streaming] object PollOps {

  /** Run independent per-poll units (appends/compactions on DISJOINT
    * state dirs) as concurrent Spark jobs instead of sequentially —
    * guide §2.6: actions are only sequential because the driver calls
    * them sequentially, and a poll's wall at fixture scale is mostly
    * driver-side plan/commit latency, which overlaps across jobs. The
    * caller must guarantee the units are mutually independent (no
    * ordering contract between them — any INTERNAL ordering, like
    * ContamStream's marker-before-data rule, stays inside one unit).
    * Exceptions propagate (first failing unit), same crash class as the
    * sequential form: a batch interrupted mid-append is re-run. */
  def inParallel(units: Seq[() => Unit]): Unit =
    if (units.sizeIs <= 1) units.foreach(_())
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(units.size)
      try units
        .map(u => pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = u()
        }))
        .foreach(_.get())
      finally { pool.shutdown(); () }
    }
}
