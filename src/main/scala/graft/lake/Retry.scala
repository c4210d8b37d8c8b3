package graft.lake

/** Generic retry with exponential backoff (reference X1 —
  * `jobs/utils/retry.py:25-60`): attempt n sleeps `delay * 2^(n-1)`.
  * Defaults (3 attempts, 5 s base) are overridable per call or via the
  * `ETL_MAX_RETRIES` / `ETL_RETRY_DELAY` environment variables, matching
  * the reference's configuration surface.
  *
  * `sleep` is injectable so the backoff law is unit-testable without
  * wall-clock time.
  */
object Retry {
  val DefaultMaxRetries: Int =
    sys.env.get("ETL_MAX_RETRIES").flatMap(_.toIntOption).getOrElse(3)
  val DefaultDelaySeconds: Double =
    sys.env.get("ETL_RETRY_DELAY").flatMap(_.toDoubleOption).getOrElse(5.0)

  final case class RetriesExhausted(label: String, attempts: Int, last: Throwable)
    extends RuntimeException(
      s"$label failed after $attempts attempts: ${last.getMessage}", last)

  def withRetry[T](
      label: String,
      maxRetries: Int = DefaultMaxRetries,
      delaySeconds: Double = DefaultDelaySeconds,
      sleep: Double => Unit = s => Thread.sleep((s * 1000).toLong),
      onRetry: (Int, Throwable) => Unit = (_, _) => ())(f: => T): T = {
    // misconfigured maxRetries <= 0 still attempts once (never a silent
    // no-op or an exhausted error with no underlying cause)
    val attempts = math.max(1, maxRetries)
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt < attempts) {
      attempt += 1
      try return f
      catch {
        case e: Throwable =>
          lastErr = e
          if (attempt < attempts) {
            onRetry(attempt, e)
            sleep(delaySeconds * math.pow(2, attempt - 1))
          }
      }
    }
    throw RetriesExhausted(label, attempts, lastErr)
  }
}
