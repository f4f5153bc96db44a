package graft.streaming

/** Sink-side retry with exponential backoff (T7) — the reference's workpool
  * retry policy (`setup.md:973-1009`: 4 attempts, 500 ms initial delay,
  * base-2 backoff). Wraps driver-side actions (a micro-batch's target merge,
  * a dead-letter append): a transient failure retries with growing delay; a
  * failure that survives every attempt is rethrown for the caller to
  * dead-letter or fail the query.
  *
  * Deliberately driver-side and synchronous: inside `foreachBatch` the batch
  * must not commit until the sink write durably succeeded, so the retry
  * must block the micro-batch — same position in the pipeline as the
  * reference's per-action retrier inside a work item.
  */
object Retry {

  /** Run `action`, retrying up to `attempts` times total with delays
    * `baseDelayMs * factor^(attempt-1)`. `onRetry` observes each failure
    * before the backoff sleep (for logging / metrics / tests).
    */
  def withBackoff[A](attempts: Int = 4, baseDelayMs: Long = 500,
                     factor: Double = 2.0,
                     onRetry: (Int, Throwable) => Unit = (_, _) => ())(
                     action: => A): A = {
    require(attempts >= 1, "at least one attempt required")
    var delay = baseDelayMs.toDouble
    var attempt = 1
    while (true) {
      try return action
      catch {
        case t: Throwable if attempt < attempts =>
          onRetry(attempt, t)
          Thread.sleep(delay.toLong)
          delay *= factor
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
