package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Failure supervision for streaming queries — the reference's retry
  * contract (README.md:88, 155, 383-384): exponential backoff between
  * restarts (1 s → 32 s for producer throttle; 24 h window before DLQ for
  * delivery). Task-level retries are Spark's; this supervises whole-query
  * restarts, where checkpointed offsets make restarts exactly-once-safe.
  */
object Supervision {

  final case class Result(restarts: Int, lastError: Option[Throwable])

  /** Run `start` to completion, restarting on failure with exponential
    * backoff (`baseDelayMs`, doubling, capped at `maxDelayMs`) up to
    * `maxRestarts` times. Returns the restart count and, if the budget is
    * exhausted, the final error (the caller's DLQ/alert decision).
    */
  def runWithBackoff(maxRestarts: Int, baseDelayMs: Long = 1000L,
      maxDelayMs: Long = 32000L, sleep: Long => Unit = Thread.sleep)(
      start: () => StreamingQuery): Result = {
    var attempt = 0
    while (true) {
      val outcome =
        try { start().awaitTermination(); None }
        catch {
          // fatal JVM errors (OOM, LinkageError) must propagate — restarting
          // past them masks corruption; interruption is a shutdown request,
          // not a query failure: restore the flag and abort the loop
          case e: InterruptedException =>
            Thread.currentThread().interrupt(); throw e
          case scala.util.control.NonFatal(e) => Some(e)
        }
      outcome match {
        case None => return Result(attempt, None)
        case Some(e) =>
          if (attempt >= maxRestarts) return Result(attempt, Some(e))
          // cap the exponent: an unbounded shift wraps long past attempt 54
          sleep(math.min(baseDelayMs << math.min(attempt, 20), maxDelayMs))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
