package graft.ops

/** Overlap INDEPENDENT Spark actions inside one operator (guide §2.6:
  * "actions are only sequential because your driver code calls them
  * sequentially"): the index-lifecycle ops write several segment
  * directories that depend on the same materialized input but not on
  * each other (compact's postings/terms/doclen consolidations, the
  * graph build's adjacency/vectors/seeds/meta components), and running
  * them back-to-back leaves the cluster idle through each job's tail
  * and every job-submission latency. Submitting them from a bounded
  * pool lets the next write's tasks back-fill executors freed by the
  * previous write's stragglers — same result, strictly less wall time.
  *
  * Scope discipline: ONLY for actions that are mutually independent
  * and write to DISJOINT paths; the manifest commit that publishes
  * them stays strictly after the join. Failures propagate: the first
  * failed action rethrows on the calling thread (after all complete),
  * so an op can never commit a manifest over a failed write. Threads
  * inherit nothing thread-local that matters here (job groups/
  * descriptions are cosmetic); Spark's scheduler handles concurrent
  * jobs natively (FIFO = back-fill).
  */
private[graft] object Par {

  /** Run the thunks concurrently (bounded by the thunk count — the
    * callers pass 2–4), rethrow the first failure after all finish. */
  def run(thunks: (() => Unit)*): Unit = {
    if (thunks.size <= 1) { thunks.foreach(_.apply()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
    try {
      val futures = thunks.map(t => pool.submit(new java.util.concurrent.Callable[Unit] {
        override def call(): Unit = t()
      }))
      // catch Throwable per future (r16 ADVICE): an InterruptedException
      // or CancellationException escaping mid-foreach would unwind the
      // caller while sibling segment writes are still running — every
      // in-flight thunk must quiesce before this frame exits, whatever
      // the failure class
      var firstFailure: Option[Throwable] = None
      futures.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (firstFailure.isEmpty) firstFailure = Some(e.getCause)
          case t: Throwable =>
            if (firstFailure.isEmpty) firstFailure = Some(t)
        }
      }
      firstFailure.foreach(throw _)
    } finally {
      pool.shutdown()
      // bounded quiesce: Spark actions are interruptible only at task
      // boundaries, so give in-flight thunks a generous-but-finite
      // window; the manifest commit is already unreachable on failure.
      // A second interrupt here must not mask the recorded failure —
      // restore the flag and let the original exception propagate.
      try pool.awaitTermination(10, java.util.concurrent.TimeUnit.MINUTES)
      catch { case _: InterruptedException => Thread.currentThread().interrupt() }
    }
  }
}
