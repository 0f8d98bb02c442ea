package graft

import java.time.Instant
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.config.{KinesisSettings, QueueConfig}
import graft.filters.{FilterSpec, PayloadFilter}
import graft.functions.Backoff
import graft.state.CheckpointStore

/** Truth-table coverage of the lease/checkpoint state machine
  * (`Decisions.Kinesis/KinesisCheckPointer.cs:18-220`) plus backoff bounds
  * (`KinesisThreadJobs.cs:107-117,226`) and config validation
  * (`KinesisMessageQueue.cs:417-472`).
  */
class CheckpointStoreSpec extends AnyFunSuite {
  /** Minimal scalacheck runner (scalatestplus bridge not on the offline
    * classpath). */
  private def checkProp(p: Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default, p)
    assert(res.passed, res.status.toString)
  }

  private def storeAt(epoch: Long*): (CheckpointStore, () => Unit) = {
    val it = epoch.iterator
    var cur = 0L
    val advance = () => { cur = it.next() }
    advance()
    (new CheckpointStore(() => Instant.ofEpochSecond(cur)), advance)
  }

  test("no row: acquire inserts and wins") {
    val (st, _) = storeAt(0)
    assert(st.acquireLease("s", "q", "sh", "t1"))
    assert(st.snapshot("s_q_sh").leaseOwner.contains("t1"))
  }

  test("valid lease: owner renews, stranger loses") {
    val (st, _) = storeAt(0)
    assert(st.acquireLease("s", "q", "sh", "t1"))
    assert(st.acquireLease("s", "q", "sh", "t1"))  // renew
    assert(!st.acquireLease("s", "q", "sh", "t2")) // held
  }

  test("expired lease: stranger takes over, sequence survives") {
    val (st, advance) = storeAt(0, 120)
    assert(st.acquireLease("s", "q", "sh", "t1"))
    st.saveCheckpoint("s", "q", "sh", "42")
    advance() // now t=120 > expiry at 60
    assert(st.acquireLease("s", "q", "sh", "t2"))
    assert(st.getCheckpoint("s", "q", "sh").contains("42"))
    assert(st.snapshot("s_q_sh").leaseOwner.contains("t2"))
  }

  test("release frees the lease but keeps the sequence") {
    // The reference expires with `>= UtcNow` (`KinesisCheckPointer.cs:46`),
    // so a release is visible one tick later, not at the same instant.
    val (st, advance) = storeAt(0, 1)
    st.acquireLease("s", "q", "sh", "t1")
    st.saveCheckpoint("s", "q", "sh", "99")
    st.releaseLease("s", "q", "sh")
    advance()
    assert(st.acquireLease("s", "q", "sh", "t2"))
    assert(st.getCheckpoint("s", "q", "sh").contains("99"))
  }

  test("releaseAllLeases only touches the calling thread's leases") {
    val (st, _) = storeAt(0)
    st.acquireLease("s", "q", "a", "t1")
    st.acquireLease("s", "q", "b", "t2")
    st.releaseAllLeases("s", "q", "t1")
    assert(st.snapshot("s_q_a").leaseOwner.isEmpty)
    assert(st.snapshot("s_q_b").leaseOwner.contains("t2"))
  }

  test("checkpoint invalidation clears sequence only (ST3)") {
    val (st, _) = storeAt(0)
    st.acquireLease("s", "q", "sh", "t1")
    st.saveCheckpoint("s", "q", "sh", "7")
    st.clearCheckpoint("s", "q", "sh")
    assert(st.getCheckpoint("s", "q", "sh").isEmpty)
    assert(st.snapshot("s_q_sh").leaseOwner.contains("t1"))
  }

  test("composite id format matches CheckPoint entity (CPE:78)") {
    assert(CheckpointStore.checkpointId("st", "qu", "sh") == "st_qu_sh")
  }

  test("backoff delay is capped at 32s for all attempts and jitter") {
    checkProp(Prop.forAll(Gen.choose(0, 200), Gen.choose(0.0, 1.0)) {
      (attempt, jitter) =>
        val d = Backoff.delaySeconds(5.0, attempt, jitter)
        d <= Backoff.MaxDelaySeconds && d >= 0.0
    })
  }

  test("backoff follows 5·2^n below the cap") {
    assert(Backoff.delaySeconds(5.0, 0) == 5.0)
    assert(Backoff.delaySeconds(5.0, 1) == 10.0)
    assert(Backoff.delaySeconds(5.0, 2) == 20.0)
    assert(Backoff.delaySeconds(5.0, 3) == 32.0) // 40 capped
  }

  test("withRetry retries only retryable errors, max maxRetries times") {
    var calls = 0
    val r = Backoff.withRetry(3, 0.0, _ => ()) { () =>
      calls += 1
      if (calls < 3) throw new Backoff.RetryableException("throttle", 400, throttled = true)
      "ok"
    }
    assert(r == "ok" && calls == 3)
    calls = 0
    intercept[IllegalArgumentException] {
      Backoff.withRetry(3, 0.0, _ => ()) { () =>
        calls += 1; throw new IllegalArgumentException("terminal")
      }
    }
    assert(calls == 1) // non-retryable: no retry (TJ:83-88)
    calls = 0
    intercept[Backoff.RetryableException] {
      Backoff.withRetry(2, 0.0, _ => ()) { () =>
        calls += 1; throw new Backoff.RetryableException("5xx", 503)
      }
    }
    assert(calls == 3) // initial + 2 retries
  }

  test("E5 error taxonomy mirrors FormatErrorMessage (TJ:817-823)") {
    val svc = new Backoff.ServiceException(
      "Rate exceeded", "ProvisionedThroughputExceededException", 400,
      throttled = true)
    assert(Backoff.formatErrorMessage(svc) ==
      "Kinesis error: Rate exceeded (ErrorCode: " +
        "ProvisionedThroughputExceededException, StatusCode: 400)")
    assert(Backoff.formatErrorMessage(new IllegalStateException("boom")) ==
      "Error: IllegalStateException - boom")
    // RetryableException IS a service error → service-shaped format
    assert(Backoff.formatErrorMessage(
      new Backoff.RetryableException("x", 503)).startsWith("Kinesis error:"))
  }

  test("E4 setup failure sleeps fixed 30s, logs formatted error, rethrows") {
    var slept = 0L
    val logs = Seq.newBuilder[String]
    intercept[IllegalStateException] {
      Backoff.setupWithBackoff(ms => slept += ms, logs += _) { () =>
        throw new IllegalStateException("no creds")
      }
    }
    assert(slept == 30000L)
    val msg = logs.result().mkString
    assert(msg.contains("Failed to set up client") &&
      msg.contains("Error: IllegalStateException - no creds"))
    // success path: no sleep, no log
    slept = 0
    assert(Backoff.setupWithBackoff(ms => slept += ms)(() => 42) == 42)
    assert(slept == 0L)
  }

  test("withRetry logs each retried failure through the E5 formatter") {
    val logs = Seq.newBuilder[String]
    var calls = 0
    Backoff.withRetry(3, 0.0, _ => (), logs += _) { () =>
      calls += 1
      if (calls < 3)
        throw new Backoff.RetryableException("throttle", 400, throttled = true)
      "ok"
    }
    val out = logs.result()
    assert(out.size == 2 && out.forall(_.contains("Kinesis error: throttle")))
  }

  test("config validation mirrors MQ:417-472") {
    val ok = QueueConfig("stream", QueueConfig.StartFromOldest)
    assert(QueueConfig.validate(ok).isEmpty)
    assert(QueueConfig.validate(ok.copy(streamName = " ")).nonEmpty)
    assert(QueueConfig.validate(ok.copy(initialStreamPosition = "nope")).nonEmpty)
    assert(QueueConfig.validate(ok.copy(maxRecordsPerRequest = 0)).nonEmpty)
    assert(QueueConfig.validate(ok.copy(maxRecordsPerRequest = 10001)).nonEmpty)
    assert(QueueConfig.validate(ok.copy(maxRetries = -1)).nonEmpty)
    assert(QueueConfig.validate(ok.copy(requestTimeout = 0)).nonEmpty)
    // EFO: exactly one of ARN/name (MQ:430-437)
    assert(QueueConfig.validate(ok.copy(useEnhancedFanOut = true)).nonEmpty)
    assert(QueueConfig.validate(ok.copy(useEnhancedFanOut = true,
      consumerArn = "arn", consumerName = "n")).nonEmpty)
    assert(QueueConfig.validate(ok.copy(useEnhancedFanOut = true,
      consumerArn = "arn")).isEmpty)
    // filter validation is included
    assert(QueueConfig.validate(ok.copy(filters = FilterSpec(Seq(
      PayloadFilter("p", "BadVerb", "v"))))).nonEmpty)
  }

  test("settings layering: override wins only when flagged (U:54-66)") {
    val global = KinesisSettings(region = "us-east-1")
    val local = KinesisSettings(region = "eu-west-1")
    val q = QueueConfig("s", QueueConfig.StartFromOldest, settings = local)
    assert(QueueConfig.effectiveSettings(q, global) == global)
    assert(QueueConfig.effectiveSettings(q.copy(overrideSettings = true),
      global) == local)
  }
}
