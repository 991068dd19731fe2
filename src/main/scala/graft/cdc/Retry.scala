package graft.cdc

/** Engine-level retry policy for a streaming epoch's merge-apply, layered
  * ON TOP of Spark's own task retries and checkpoint-restart recovery:
  * Spark re-runs failed TASKS, and a restarted query re-runs the whole
  * epoch, but a transient driver-side failure inside foreachBatch (a
  * filesystem hiccup during commit, a lost snapshot-claim race) previously
  * surfaced straight to the stream with no knob. The policy is CONFIG
  * DATA ([[graft.enrich.RulesConfig]] `retry` section) — counts and
  * backoff are a deployment decision, not a recompile (reference analog:
  * per-step retry counts/backoff in Config/config.yaml:149-152 and the
  * no-retry-on-deterministic-failure rule,
  * Docs/etl_requirements_reviewed_by_sr.md:244).
  *
  * @param maxAttempts   total tries including the first (1 = no retry)
  * @param backoffMs     sleep before the first retry
  * @param backoffFactor multiplier per subsequent retry (exponential)
  */
final case class RetryPolicy(
    maxAttempts: Int = 3,
    backoffMs: Long = 1000L,
    backoffFactor: Double = 2.0)

object RetryPolicy {
  val default: RetryPolicy = RetryPolicy()
  /** No engine-level retry — fail straight to the stream (Spark restart
    * semantics only), for callers that manage retries themselves.
    */
  val none: RetryPolicy = RetryPolicy(maxAttempts = 1)
}

object Retry {

  /** Deterministic failures re-fail identically on every attempt, so
    * retrying them only delays the surfacing of a real bug (the
    * reference's explicit no-retry rule,
    * Docs/etl_requirements_reviewed_by_sr.md:244): plan/schema analysis
    * errors and bad arguments are deterministic; IO and commit-race
    * failures are not (a lost claim re-reads current state on retry —
    * that IS the documented recovery for CommitConflictException).
    */
  def deterministic(e: Throwable): Boolean = e match {
    case _: org.apache.spark.sql.AnalysisException => true
    case _: IllegalArgumentException => true
    case _: NoSuchElementException => true
    case _ => false
  }

  /** Run `body`, retrying per `policy` on non-deterministic NON-FATAL
    * failures with exponential backoff. The last failure (or any
    * deterministic one) propagates unchanged. Fatal errors (OOM, stack
    * overflow) and interrupts are NEVER retried: a corrupted JVM must
    * surface immediately, and an interrupt means the stream is stopping —
    * catching it (which clears the flag) and re-running the epoch would
    * fight the shutdown, so it propagates with the flag restored.
    */
  def run[T](policy: RetryPolicy, what: String)(body: => T): T = {
    var attempt = 1
    var backoff = policy.backoffMs
    while (true) {
      try return body
      catch {
        case e: InterruptedException =>
          Thread.currentThread().interrupt()
          throw e
        case scala.util.control.NonFatal(e)
            if attempt < policy.maxAttempts && !deterministic(e) =>
          System.err.println(s"[retry] $what attempt $attempt/${policy.maxAttempts} failed " +
            s"(${e.getClass.getSimpleName}: ${e.getMessage}) — retrying in $backoff ms")
          // the backoff sleep is itself interruptible: restore the flag
          // here too, or a stop() landing mid-backoff escapes with the
          // interrupt status cleared
          try Thread.sleep(backoff)
          catch {
            case ie: InterruptedException =>
              Thread.currentThread().interrupt()
              throw ie
          }
          backoff = math.max(1L, (backoff * policy.backoffFactor).toLong)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
