package graft

import java.time.Instant
import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.config.QueueConfig
import graft.functions.Backoff
import graft.state.CheckpointStore
import graft.streaming._

/** Executes the S2/S4/S5 transport control flow against the scripted
  * in-memory Kinesis: polling with shard close, EFO subscribe +
  * continuation resume across subscription ends, ST3 checkpoint
  * invalidation, throttle retry, and ARN resolution — the paths that
  * previously existed only as option maps (`KinesisThreadJobs.cs:442-531`,
  * `:629-682`).
  */
class FakeKinesisSpec extends AnyFunSuite {

  /** Monotone self-advancing clock: every read ticks 10 ms, so the
    * release→reacquire cycle in `runQueue` never hits the same-instant
    * lease parity quirk (`KinesisCheckPointer.cs:46-62`).
    */
  private def tickingStore(): CheckpointStore = {
    var t = Instant.EPOCH
    new CheckpointStore(() => { t = t.plusMillis(10); t })
  }

  private final class Collecting extends RecordSink {
    val seen = mutable.ArrayBuffer.empty[(String, String)] // (key, seq)
    override def deliver(r: FetchedRecord): Boolean = {
      seen += ((r.partitionKey, r.sequenceNumber)); true
    }
  }

  private def newService(shards: Seq[String] = Seq("shard-0", "shard-1"))
      : FakeKinesisService = {
    val svc = new FakeKinesisService
    svc.createStream("s", shards)
    svc
  }

  private def put(svc: FakeKinesisService, shard: String, n: Int,
      key: String = "k"): Seq[String] =
    (1 to n).map(i => svc.putRecord("s", shard, key, s"m$i".getBytes("UTF-8")))

  private def pollQueue(useOr: Boolean = false) =
    QueueConfig("s", QueueConfig.StartFromOldest, maxRecordsPerRequest = 3)

  private def efoQueue(arn: String = "", name: String = "") =
    QueueConfig("s", QueueConfig.StartFromOldest, useEnhancedFanOut = true,
      consumerArn = arn, consumerName = name)

  test("polling: per-shard order, checkpoints advance, close ends the " +
      "shard (S1/S3/S4/ST10)") {
    val svc = newService()
    val s0 = put(svc, "shard-0", 7, key = "a")
    val s1 = put(svc, "shard-1", 2, key = "b")
    // shard-0 closed (tests the close-break); shard-1 stays open (tests
    // the caught-up pacing — the close-break precedes pacing, so only an
    // open shard ever waits out the poll interval, as in the reference)
    svc.closeShard("s", "shard-0")
    val store = tickingStore()
    val sink = new Collecting
    val sleeps = mutable.ArrayBuffer.empty[Long]
    val n = ShardConsumer.runQueue(svc, store, pollQueue(), "q1", "t1", sink,
      sleep = ms => sleeps += ms, maxSweeps = 3)
    assert(n == 9) // the open shard's checkpoint prevents redelivery
    // order within each shard follows sequence order (ST7 at the transport)
    assert(sink.seen.filter(_._1 == "a").map(_._2) == s0)
    assert(sink.seen.filter(_._1 == "b").map(_._2) == s1)
    // checkpoint = last fetched sequence per shard
    assert(store.getCheckpoint("s", "q1", "shard-0").contains(s0.last))
    assert(store.getCheckpoint("s", "q1", "shard-1").contains(s1.last))
    // batch cap (maxRecordsPerRequest=3): shard-0's full batches pace at
    // shardBatchWaitTime (1 s); shard-1's short batch on the open shard
    // paces at shardPollInterval (30 s)
    assert(sleeps.contains(1000L) && sleeps.contains(30000L))
  }

  test("polling resumes AFTER the checkpoint on reacquire — no " +
      "redelivery (S4)") {
    val svc = newService(Seq("shard-0"))
    val first = put(svc, "shard-0", 3)
    val store = tickingStore()
    val sink = new Collecting
    // sweep 1: consume what's there (shard open → pass ends un-closed)
    ShardConsumer.runQueue(svc, store, pollQueue(), "q1", "t1", sink,
      sleep = _ => (), maxSweeps = 1)
    assert(sink.seen.map(_._2) == first)
    // new records arrive; sweep 2 must deliver ONLY them
    val second = put(svc, "shard-0", 2)
    ShardConsumer.runQueue(svc, store, pollQueue(), "q1", "t1", sink,
      sleep = _ => (), maxSweeps = 1)
    assert(sink.seen.map(_._2) == first ++ second)
  }

  test("ST3: trimmed checkpoint → InvalidArgument → checkpoint cleared → " +
      "restart from initial position") {
    val svc = newService(Seq("shard-0"))
    val seqs = put(svc, "shard-0", 5)
    val store = tickingStore()
    // a saved checkpoint that retention has since trimmed away
    store.saveCheckpoint("s", "q1", "shard-0", seqs(1))
    svc.trimBelow("s", "shard-0", seqs(3))
    svc.closeShard("s", "shard-0")
    val sink = new Collecting
    val pass = ShardConsumer.pollShard(svc, store, pollQueue(), "q1",
      "shard-0", sink, sleep = _ => ())
    // full redelivery FROM THE TRIM HORIZON (records 4..5 survive the trim)
    assert(pass.closed)
    assert(sink.seen.map(_._2) == seqs.drop(3))
    // and the checkpoint now reflects the re-read, not the stale sequence
    assert(store.getCheckpoint("s", "q1", "shard-0").contains(seqs.last))
  }

  test("ST3 applies ONLY to StartingSequenceNumber errors — other " +
      "failures preserve the checkpoint") {
    val svc = newService(Seq("shard-0"))
    val seqs = put(svc, "shard-0", 3)
    val store = tickingStore()
    store.saveCheckpoint("s", "q1", "shard-0", seqs.head)
    // maxRetries=0 ⇒ the scripted throttle propagates immediately
    val q = pollQueue().copy(maxRetries = 0)
    svc.throttleNext(1)
    val sink = new Collecting
    intercept[Backoff.ServiceException] {
      ShardConsumer.pollShard(svc, store, q, "q1", "shard-0", sink,
        sleep = _ => ())
    }
    assert(store.getCheckpoint("s", "q1", "shard-0").contains(seqs.head))
    assert(sink.seen.isEmpty)
  }

  test("throttled GetRecords retries under backoff and still delivers " +
      "(E1/E2/E3)") {
    val svc = newService(Seq("shard-0"))
    val seqs = put(svc, "shard-0", 2)
    svc.closeShard("s", "shard-0")
    svc.throttleNext(2) // two throttles, then success — within maxRetries=3
    val store = tickingStore()
    val sink = new Collecting
    val sleeps = mutable.ArrayBuffer.empty[Long]
    val pass = ShardConsumer.pollShard(svc, store, pollQueue(), "q1",
      "shard-0", sink, sleep = ms => sleeps += ms)
    assert(pass.closed && sink.seen.map(_._2) == seqs)
    // two backoff sleeps happened (base 5 s · 2^attempt + jitter, ms)
    assert(sleeps.count(ms => ms >= 5000L && ms <= 32000L) >= 2)
  }

  test("EFO: consumer-name → ARN resolution via DescribeStreamConsumer " +
      "(S5); unknown name takes the E4 fixed-sleep path") {
    val svc = newService()
    val arn = svc.registerStreamConsumer("s", "my-consumer")
    assert(ShardConsumer.resolveConsumerArn(svc,
      efoQueue(name = "my-consumer"), sleep = _ => ()) == arn)
    // explicit ARN short-circuits resolution
    assert(ShardConsumer.resolveConsumerArn(svc,
      efoQueue(arn = "arn:explicit"), sleep = _ => ()) == "arn:explicit")
    // unknown name: E4 — fixed 30 s sleep, then rethrow
    val sleeps = mutable.ArrayBuffer.empty[Long]
    intercept[IllegalArgumentException] {
      ShardConsumer.resolveConsumerArn(svc, efoQueue(name = "nope"),
        sleep = ms => sleeps += ms)
    }
    assert(sleeps == Seq(30000L))
  }

  test("EFO: subscribe delivers in order, checkpoints per event, null " +
      "continuation = shard closed (S2)") {
    val svc = newService(Seq("shard-0"))
    svc.efoBatchSize = 2
    val arn = svc.registerStreamConsumer("s", "c")
    val seqs = put(svc, "shard-0", 5)
    svc.closeShard("s", "shard-0")
    val store = tickingStore()
    val sink = new Collecting
    val pass = ShardConsumer.efoShard(svc, store, efoQueue(name = "c"),
      "q1", "shard-0", arn, sink, sleep = _ => ())
    assert(pass.closed && pass.delivered == 5)
    assert(sink.seen.map(_._2) == seqs)
    assert(store.getCheckpoint("s", "q1", "shard-0").contains(seqs.last))
  }

  test("EFO continuation resume: a server-capped subscription ends " +
      "mid-shard; the next acquire resubscribes after the checkpoint " +
      "with no loss and no duplicates (S2)") {
    val svc = newService(Seq("shard-0"))
    svc.efoBatchSize = 2
    svc.maxEventsPerSubscription = 1 // the 5-minute-window analog
    svc.registerStreamConsumer("s", "c")
    val seqs = put(svc, "shard-0", 7)
    svc.closeShard("s", "shard-0")
    val store = tickingStore()
    val sink = new Collecting
    // 7 records / 2 per event / 1 event per subscription ⇒ 4 subscriptions;
    // each sweep = one lease→subscribe→release cycle
    val n = ShardConsumer.runQueue(svc, store, efoQueue(name = "c"), "q1",
      "t1", sink, sleep = _ => (), maxSweeps = 10)
    assert(n == 7)
    assert(sink.seen.map(_._2) == seqs) // exactly once, in order
  }

  test("EFO: trimmed checkpoint propagates on subscribe (the reference " +
      "has no EFO reset path — parity)") {
    val svc = newService(Seq("shard-0"))
    svc.registerStreamConsumer("s", "c")
    val seqs = put(svc, "shard-0", 4)
    val store = tickingStore()
    store.saveCheckpoint("s", "q1", "shard-0", seqs.head)
    svc.trimBelow("s", "shard-0", seqs(2))
    val q = efoQueue(name = "c").copy(maxRetries = 0)
    val arn = ShardConsumer.resolveConsumerArn(svc, q, sleep = _ => ())
    intercept[InvalidArgumentException] {
      ShardConsumer.efoShard(svc, store, q, "q1", "shard-0", arn,
        new Collecting, sleep = _ => ())
    }
    // checkpoint preserved — only the polling path's GetShardIterator
    // clears it (`KinesisThreadJobs.cs:667-674`)
    assert(store.getCheckpoint("s", "q1", "shard-0").contains(seqs.head))
  }

  test("lease exclusivity: a second consumer thread cannot acquire a " +
      "held shard (ST4)") {
    val svc = newService(Seq("shard-0"))
    put(svc, "shard-0", 1)
    var t = Instant.EPOCH
    val store = new CheckpointStore(() => t)
    assert(store.acquireLease("s", "q1", "shard-0", "t1"))
    // t2's runQueue sweep finds the lease held and delivers nothing
    val sink = new Collecting
    val n = ShardConsumer.runQueue(svc, store, pollQueue(), "q1", "t2",
      sink, sleep = _ => (), maxSweeps = 1)
    assert(n == 0 && sink.seen.isEmpty)
  }

  test("failing sink: non-retryable failure aborts the pass, checkpoint " +
      "stays at the last successful batch (E3)") {
    val svc = newService(Seq("shard-0"))
    val seqs = put(svc, "shard-0", 5) // maxRecordsPerRequest=3 → 2 batches
    svc.closeShard("s", "shard-0")
    val store = tickingStore()
    val sink = new RecordSink {
      var n = 0
      override def deliver(r: FetchedRecord): Boolean = {
        n += 1; n <= 3 // batch 1 (3 records) ok, batch 2 fails
      }
    }
    intercept[RuntimeException] {
      ShardConsumer.pollShard(svc, store, pollQueue(), "q1", "shard-0",
        sink, sleep = _ => ())
    }
    assert(store.getCheckpoint("s", "q1", "shard-0").contains(seqs(2)))
  }

  test("end-to-end: fake transport feeds the engine pipeline through " +
      "RecordSource (S2 + K2)") {
    val spark = SparkTestSession.get
    val svc = newService(Seq("shard-0", "shard-1"))
    svc.registerStreamConsumer("s", "c")
    for (i <- 1 to 4)
      svc.putRecord("s", "shard-0", "shard-0",
        s"""{"k": $i}""".getBytes("UTF-8"))
    svc.putRecord("s", "shard-1", "shard-1", "not json".getBytes("UTF-8"))
    svc.closeShard("s", "shard-0"); svc.closeShard("s", "shard-1")
    val transportStore = tickingStore()
    val queue = efoQueue(name = "c")
    val src = new FakeKinesisRecordSource(svc, queue, transportStore)
    val engineStore = tickingStore()
    val rt = new QueueRuntime(spark, queue, engineStore, queueId = "qe")
    TestSink.reset()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-fk").toString
    val q = rt.start(src, new CollectingHandler, ckpt)
    try {
      assert(src.pump(maxSweeps = 5) == 5) // transport drains both shards
      q.processAllAvailable()
    } finally rt.stop()
    // all 5 envelopes delivered (parse-passthrough keeps the non-JSON one)
    assert(rt.deliveredCount == 5)
    // both layers checkpointed: transport by shardId, engine by key
    assert(transportStore.getCheckpoint("s", "q1", "shard-0").nonEmpty)
    assert(engineStore.getCheckpoint("s", "qe", "shard-0").nonEmpty)
  }

  test("S3 resharding: a mid-run SPLIT is picked up by the next sweep — " +
      "parent residue drains and closes before the children drain " +
      "(the reference's rescan contract, KinesisThreadJobs.cs:230-281)") {
    val svc = newService(Seq("shard-0"))
    val first = put(svc, "shard-0", 3, key = "p")
    val store = tickingStore()
    val sink = new Collecting
    // sweep 1: drain the open parent (pass ends un-closed, checkpointed)
    ShardConsumer.runQueue(svc, store, pollQueue(), "q1", "t1", sink,
      sleep = _ => (), maxSweeps = 1)
    assert(sink.seen.map(_._2) == first)
    // between sweeps: more parent records arrive, then the stream splits
    val residue = put(svc, "shard-0", 2, key = "p")
    svc.splitShard("s", "shard-0", "shard-0-a", "shard-0-b")
    // a sealed parent accepts no more writes (AWS: ending sequence set)
    intercept[IllegalArgumentException] {
      svc.putRecord("s", "shard-0", "p", "late".getBytes("UTF-8"))
    }
    val ca = (1 to 2).map(i =>
      svc.putRecord("s", "shard-0-a", "a", s"a$i".getBytes("UTF-8")))
    val cb = (1 to 2).map(i =>
      svc.putRecord("s", "shard-0-b", "b", s"b$i".getBytes("UTF-8")))
    // sweep 2: the re-describe discovers the children; the parent's
    // residue (written before the seal) drains FIRST and its close is
    // detected, then each child drains from TrimHorizon
    ShardConsumer.runQueue(svc, store, pollQueue(), "q1", "t1", sink,
      sleep = _ => (), maxSweeps = 1)
    assert(sink.seen.map(_._2) == first ++ residue ++ ca ++ cb)
    // children got their own checkpoints and the parent's is its residue
    assert(store.getCheckpoint("s", "q1", "shard-0").contains(residue.last))
    assert(store.getCheckpoint("s", "q1", "shard-0-a").contains(ca.last))
    assert(store.getCheckpoint("s", "q1", "shard-0-b").contains(cb.last))
    // sweep 3: the closed parent is never re-polled, children resume
    val more = (1 to 1).map(_ =>
      svc.putRecord("s", "shard-0-a", "a", "a3".getBytes("UTF-8")))
    ShardConsumer.runQueue(svc, store, pollQueue(), "q1", "t1", sink,
      sleep = _ => (), maxSweeps = 1)
    assert(sink.seen.map(_._2) == first ++ residue ++ ca ++ cb ++ more)
  }

  test("S3 resharding: a MERGE seals both parents and the merged child " +
      "is discovered and drained on the next sweep") {
    val svc = newService(Seq("shard-0", "shard-1"))
    val s0 = put(svc, "shard-0", 2, key = "x")
    val s1 = put(svc, "shard-1", 2, key = "y")
    val store = tickingStore()
    val sink = new Collecting
    ShardConsumer.runQueue(svc, store, pollQueue(), "q1", "t1", sink,
      sleep = _ => (), maxSweeps = 1)
    assert(sink.seen.size == 4)
    svc.mergeShards("s", "shard-0", "shard-1", "shard-m")
    val cm = (1 to 3).map(i =>
      svc.putRecord("s", "shard-m", "m", s"m$i".getBytes("UTF-8")))
    // merging an already-sealed shard is rejected
    intercept[IllegalArgumentException] {
      svc.mergeShards("s", "shard-0", "shard-m", "shard-z")
    }
    ShardConsumer.runQueue(svc, store, pollQueue(), "q1", "t1", sink,
      sleep = _ => (), maxSweeps = 1)
    assert(sink.seen.map(_._2) == s0 ++ s1 ++ cm)
    assert(store.getCheckpoint("s", "q1", "shard-m").contains(cm.last))
  }

  test("S3 resharding under EFO: the split children are discovered by " +
      "the next sweep and drained through fresh subscriptions, parent " +
      "close via null continuation") {
    val svc = newService(Seq("shard-0"))
    svc.registerStreamConsumer("s", "c")
    val first = put(svc, "shard-0", 2, key = "p")
    val store = tickingStore()
    val sink = new Collecting
    ShardConsumer.runQueue(svc, store, efoQueue(name = "c"), "q1", "t1",
      sink, sleep = _ => (), maxSweeps = 1)
    assert(sink.seen.map(_._2) == first)
    svc.splitShard("s", "shard-0", "shard-0-a", "shard-0-b")
    val ca = (1 to 2).map(i =>
      svc.putRecord("s", "shard-0-a", "a", s"a$i".getBytes("UTF-8")))
    ShardConsumer.runQueue(svc, store, efoQueue(name = "c"), "q1", "t1",
      sink, sleep = _ => (), maxSweeps = 1)
    assert(sink.seen.map(_._2) == first ++ ca)
    assert(store.getCheckpoint("s", "q1", "shard-0-a").contains(ca.last))
  }
}
