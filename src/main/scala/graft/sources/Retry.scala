package graft.sources

/** Bounded retry with exponential backoff — the error-handling seam a
  * production extract/load loop wraps around every remote call
  * (Salesforce API page pulls, JDBC batch execution). Kept separate
  * from the sources so tests can drive it without a network.
  *
  * Retries only on exceptions `shouldRetry` accepts (default:
  * anything non-fatal); rethrows the last failure once attempts are
  * exhausted. Sleeps base·2^k between tries (capped), no jitter —
  * determinism matters more than herd-avoidance in a single-driver
  * batch loop.
  */
object Retry {

  def withBackoff[T](maxAttempts: Int, baseDelayMs: Long = 100,
                     maxDelayMs: Long = 30000,
                     shouldRetry: Throwable => Boolean = defaultRetryable,
                     sleep: Long => Unit = Thread.sleep)(f: => T): T = {
    require(maxAttempts >= 1, "maxAttempts must be >= 1")
    var attempt = 0
    var lastError: Throwable = null
    while (attempt < maxAttempts) {
      try {
        return f
      } catch {
        case e: Throwable if shouldRetry(e) =>
          lastError = e
          attempt += 1
          if (attempt < maxAttempts)
            // clamp the shift: baseDelayMs << 57+ wraps Long negative,
            // and math.min would then pick the negative value and make
            // Thread.sleep throw instead of backing off. 2^20·base is
            // already far past any sane maxDelayMs.
            sleep(math.min(baseDelayMs << math.min(attempt - 1, 20), maxDelayMs))
        case e: Throwable => throw e
      }
    }
    throw lastError
  }

  /** Retry transient-looking failures, never programming errors. */
  def defaultRetryable(e: Throwable): Boolean = e match {
    case _: InterruptedException => false
    case _: IllegalArgumentException => false
    case _: NullPointerException => false
    case _ => scala.util.control.NonFatal(e)
  }
}
