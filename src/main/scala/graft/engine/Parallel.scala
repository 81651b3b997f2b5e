package graft.engine

/** Overlap INDEPENDENT driver-side Spark actions (guide §2.6: the
  * scheduler happily runs several jobs at once inside one
  * application; actions are only sequential because driver code
  * calls them sequentially). Used where an operator issues two or
  * more actions with no data dependency — e.g. the span-index build
  * and the IVF build of the composed ingest gate, or the two index
  * appends of one admitted batch — so the second job's tasks
  * back-fill executors freed by the first job's tail instead of
  * waiting for its last straggler plus a full job-overhead round.
  *
  * Semantics-preserving by construction: callers may only pass
  * actions whose outputs are disjoint (different directories,
  * different tables) and whose inputs are already materialized or
  * independently derivable. Failures propagate: the first thrown
  * exception is rethrown (unwrapped) after all tasks settle, so a
  * crash mid-parallel-build leaves the same converging retry state
  * as the sequential order it replaces.
  */
object Parallel {
  def run(tasks: (() => Unit)*): Unit = {
    if (tasks.lengthCompare(1) <= 0) { tasks.foreach(_.apply()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.length)
    try {
      val futs = tasks.map { t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = t()
        })
      }
      var firstFailure: Throwable = null
      futs.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (firstFailure == null)
              firstFailure = Option(e.getCause).getOrElse(e)
        }
      }
      if (firstFailure != null) throw firstFailure
    } finally pool.shutdown()
  }
}
