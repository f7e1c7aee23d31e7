package graft.operators

/** Sink retry/rate-limit policy — the reference's operational surface
  * for chunked uploads (Form700.py:491-502): `@retry(tries=10, delay=1,
  * backoff=2)` around each chunk upsert plus a 0.25 s sleep between
  * chunks. Modeled as explicit write configuration so a deployment can
  * tune it (the reference hard-codes the decorator constants).
  *
  * At cluster scale most transient write failures are already absorbed
  * by Spark task retries; this policy wraps the DRIVER-side job
  * submission (the analog of the reference's whole-chunk retry, which
  * re-sends the entire HTTP upsert).
  */
final case class RetryPolicy(tries: Int = 10, delayMs: Long = 1000,
                             backoff: Double = 2.0, rateLimitMs: Long = 250) {
  require(tries >= 1, "tries must be >= 1")
}

object RetryPolicy {
  /** The reference's constants (Form700.py:491-502). */
  val Reference: RetryPolicy = RetryPolicy()
  /** No sleeping — for tests and local benches where wall-clock sleeps
    * only add noise (retry attempts still apply). */
  val NoWait: RetryPolicy = RetryPolicy(tries = 10, delayMs = 0,
    backoff = 2.0, rateLimitMs = 0)
}

object Retry {
  /** Run `block`, retrying up to `policy.tries` total attempts with
    * exponential backoff. `sleep` is injectable so specs can record the
    * schedule instead of wall-clock sleeping. */
  def withRetry[T](policy: RetryPolicy,
                   sleep: Long => Unit = defaultSleep)(block: => T): T = {
    var delay = policy.delayMs
    var attempt = 1
    while (true) {
      try return block
      catch {
        case scala.util.control.NonFatal(e) =>
          if (attempt >= policy.tries) throw e
          attempt += 1
          if (delay > 0) sleep(delay)
          delay = (delay * policy.backoff).toLong
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** The reference's inter-chunk rate limit (0.25 s between upserts). */
  def rateLimit(policy: RetryPolicy,
                sleep: Long => Unit = defaultSleep): Unit =
    if (policy.rateLimitMs > 0) sleep(policy.rateLimitMs)

  private def defaultSleep(ms: Long): Unit = Thread.sleep(ms)
}
