package graft.util

/** Retry with exponential backoff (reference
  * internal/component/common/common.go:294-315: RETRY_MAX attempts,
  * sleep doubling from RETRY_BACKOFF_MS). Task-level retries inside
  * jobs are Spark's (`spark.task.maxFailures`); this helper covers
  * driver-side connector calls (page fetches, table ops).
  */
object Retry {
  def apply[T](
      maxAttempts: Int = 3,
      backoffMs: Long = 1000L,
      onRetry: () => Unit = () => ())(f: => T): T = {
    var attempt = 0
    var sleep = backoffMs
    while (true) {
      try return f
      catch {
        case e: Throwable =>
          attempt += 1
          if (attempt >= maxAttempts) throw e
          onRetry()
          Thread.sleep(sleep)
          sleep *= 2
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
