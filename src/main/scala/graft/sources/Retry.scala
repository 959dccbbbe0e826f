package graft.sources

/** Bounded-retry wrapper for transport calls (S3: the reference retries
  * RPC and piece-indexer HTTP ×5 with p-retry — backend/lib/rpc-service/
  * service.js:26-30, piece-indexer-service.js:22-25). Exponential
  * backoff, injectable sleeper for tests. Belongs inside sources/sinks:
  * Spark task retry re-runs whole partitions; transient transport
  * errors should burn a few hundred milliseconds, not a task. */
object Retry {

  def withRetries[T](
      attempts: Int = 5,
      initialBackoffMs: Long = 100,
      sleep: Long => Unit = Thread.sleep)(f: => T): T = {
    var tries = 0
    var backoff = initialBackoffMs
    while (true) {
      try return f
      catch {
        // never swallow task cancellation: an interrupt means Spark is
        // killing this task — restore the flag and propagate instead of
        // converting it into backoff sleeps
        case e: InterruptedException =>
          Thread.currentThread().interrupt()
          throw e
        case scala.util.control.NonFatal(e) =>
          tries += 1
          if (tries >= attempts) throw e
          sleep(backoff)
          backoff *= 2
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
