package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Retry/backoff policy — the engine twin of the reference's retry
  * combinator (`Decisions.Kinesis/KinesisThreadJobs.cs:35-118`).
  *
  * delay(attempt) = min(base · 2^attempt + jitter, 32) seconds, jitter ∈
  * [0,1) (`KinesisThreadJobs.cs:107-117`, cap `:226`). Retryable errors:
  * provisioned-throughput/limit-exceeded and Kinesis 5xx only
  * (`KinesisThreadJobs.cs:60-88`).
  */
object Backoff {
  val MaxDelaySeconds = 32.0

  /** Deterministic core of the backoff formula (jitter excluded — it is
    * `Random.NextDouble` in the reference, SURVEY §7 risk 6; the oracle
    * checks the deterministic part, property tests bound the jittered one).
    */
  def delaySeconds(baseSeconds: Double, attempt: Int, jitter: Double = 0.0): Double =
    math.min(baseSeconds * math.pow(2.0, attempt.toDouble) + jitter,
      MaxDelaySeconds)

  /** Columnar form: schedule for an `attempt` column — codegen'd, no UDF. */
  def delayCol(baseSeconds: Column, attempt: Column): Column =
    least(baseSeconds * pow(lit(2.0), attempt), lit(MaxDelaySeconds))

  /** Error classification (`KinesisThreadJobs.cs:60-88`): retry on
    * throughput/limit exceedances and server-side (5xx) Kinesis errors;
    * everything else is terminal. The engine applies this to connector
    * calls; Spark task retries (`spark.task.maxFailures`) cover executor
    * faults.
    */
  def isRetryable(e: Throwable): Boolean = e match {
    case r: ServiceException => r.statusCode >= 500 || r.throttled
    case _ => false
  }

  /** Connector-layer service error carrying the provider's error code and
    * HTTP status — the shape E5's formatter distinguishes.
    */
  class ServiceException(msg: String, val errorCode: String,
      val statusCode: Int, val throttled: Boolean = false)
    extends RuntimeException(msg)

  /** Marker for connector-layer errors carrying an HTTP status. */
  class RetryableException(msg: String, statusCode: Int,
      throttled: Boolean = false)
    extends ServiceException(msg, "", statusCode, throttled)

  /** E5 — error-formatting taxonomy (`KinesisThreadJobs.cs:817-823`,
    * `FormatErrorMessage`): service errors render message + error code +
    * HTTP status; anything else renders type name + message.
    */
  def formatErrorMessage(e: Throwable): String = e match {
    case s: ServiceException =>
      s"Kinesis error: ${s.getMessage} (ErrorCode: ${s.errorCode}, " +
        s"StatusCode: ${s.statusCode})"
    case other =>
      s"Error: ${other.getClass.getSimpleName} - ${other.getMessage}"
  }

  /** E4 — client-setup failure path (`KinesisThreadJobs.cs:152-156`): a
    * failed setup logs the formatted error, sleeps a FIXED 30 s (not the
    * exponential schedule — the reference treats setup specially), and
    * rethrows so the caller's lifecycle sees the failure.
    */
  val SetupFailureSleepSeconds = 30

  def setupWithBackoff[T](sleep: Long => Unit = Thread.sleep,
      log: String => Unit = _ => ())(op: () => T): T =
    try op()
    catch {
      // an interrupt is a SHUTDOWN signal, not a setup failure: restore
      // the flag and rethrow immediately — sleeping 30 s here would
      // stall the very shutdown the interrupt requested. Fatal errors
      // (OOM, linkage) propagate untouched.
      case e: InterruptedException =>
        Thread.currentThread().interrupt()
        throw e
      case scala.util.control.NonFatal(e) =>
        log(s"Failed to set up client: ${formatErrorMessage(e)}. " +
          s"Sleeping for ${SetupFailureSleepSeconds}s")
        sleep(SetupFailureSleepSeconds * 1000L)
        throw e
    }

  /** Synchronous retry combinator for connector/driver-side calls (never
    * on the executor hot path). Mirrors `ExecuteWithRetryAsync`; each
    * retried failure is logged through the E5 formatter.
    */
  def withRetry[T](maxRetries: Int, baseSeconds: Double,
      sleep: Long => Unit = Thread.sleep,
      log: String => Unit = _ => ())(op: () => T): T = {
    var attempt = 0
    while (true) {
      try return op()
      catch {
        case e: Throwable if isRetryable(e) && attempt < maxRetries =>
          log(s"Attempt ${attempt + 1}/$maxRetries failed: " +
            formatErrorMessage(e))
          val d = delaySeconds(baseSeconds, attempt, math.random())
          sleep((d * 1000).toLong)
          attempt += 1
        case e: Throwable => throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
