package graft.streaming

import scala.collection.mutable

import graft.config.QueueConfig
import graft.functions.Backoff
import graft.state.CheckpointStore

/** Where transport-fetched records land. Returning false or throwing fails
  * the record; the loops wrap delivery in the retry combinator exactly as
  * the reference wraps `ProcessRecordAsync` (`KinesisThreadJobs
  * .cs:386-402,483-500`). Payload filtering/decoding is NOT done here — in
  * this engine that is the declarative pipeline's job
  * ([[QueueRuntime.pipelineWithVerdict]], P1-P10); the transport's contract
  * ends at the envelope.
  */
trait RecordSink {
  def deliver(r: FetchedRecord): Boolean
}

/** The reference's per-shard control flow (`KinesisThreadJobs.cs`),
  * executed against any [[KinesisApi]] — in specs, the scripted
  * [[FakeKinesisService]]; in a real deployment, an SDK-backed client.
  *
  * Faithfully mirrored semantics:
  *   - S4 start-position resolution: checkpoint → AFTER_SEQUENCE_NUMBER,
  *     else the queue's initial position (`GetStartingPosition`,
  *     `KinesisThreadJobs.cs:533-560`; invalid config throws).
  *   - ST3 checkpoint invalidation: GetShardIterator rejecting the saved
  *     sequence ("StartingSequenceNumber") clears the checkpoint and
  *     retries ONCE from the initial position; every other error preserves
  *     the checkpoint and propagates (`KinesisThreadJobs.cs:667-682`).
  *   - Polling loop: GetRecords under backoff-retry, per-record delivery
  *     under backoff-retry, checkpoint = last FETCHED record of the batch,
  *     break on null next-iterator = shard closed
  *     (`KinesisThreadJobs.cs:348-440`).
  *   - EFO loop: one SubscribeToShard per (re)acquire, events processed
  *     until the server ends the subscription or continuation goes null =
  *     shard closed; checkpoint after each non-empty event
  *     (`KinesisThreadJobs.cs:442-531`). The reference does NOT resubscribe
  *     in-method — the subscription ending returns the shard to the
  *     acquire sweep, which re-subscribes from the checkpoint; [[runQueue]]
  *     reproduces that lease→process→release cycle.
  *   - E4 setup: consumer-ARN resolution failures sleep a fixed 30 s and
  *     rethrow (`KinesisThreadJobs.cs:120-159`).
  *
  * `sleep` is injectable so specs record pacing/backoff instead of waiting;
  * `stop` is the cancellation-token analog (`cancellationToken
  * .IsCancellationRequested || isShuttingDown`).
  */
object ShardConsumer {

  /** Outcome of one shard processing pass. `closed` = the shard ended
    * (null next-iterator / null continuation); an un-closed return means
    * the pass was cut by `stop`/subscription end and the shard should be
    * re-acquired later.
    */
  final case class ShardPass(closed: Boolean, delivered: Long)

  /** S5 — `SetUp` (`KinesisThreadJobs.cs:131-148`): explicit ARN wins,
    * else resolve the name via DescribeStream → DescribeStreamConsumer;
    * EFO with neither is a config error. Failures take the E4 fixed-sleep
    * path.
    */
  def resolveConsumerArn(api: KinesisApi, queue: QueueConfig,
      sleep: Long => Unit = Thread.sleep): String =
    Backoff.setupWithBackoff(sleep)(() => {
      if (queue.consumerArn != null && queue.consumerArn.nonEmpty)
        queue.consumerArn
      else if (queue.consumerName != null && queue.consumerName.nonEmpty) {
        val arn = api.describeStream(queue.streamName).streamArn
        api.describeStreamConsumer(arn, queue.consumerName)
      } else throw new IllegalStateException(
        "Enhanced Fan-Out requires either Consumer ARN or Consumer Name")
    })

  /** S4 — `GetStartingPosition` (`KinesisThreadJobs.cs:533-560`). */
  def startingPosition(checkpoint: Option[String],
      queue: QueueConfig): StartingPosition = checkpoint match {
    case Some(seq) => StartingPosition.AfterSequenceNumber(seq)
    case None => queue.initialStreamPosition match {
      case QueueConfig.StartFromOldest => StartingPosition.TrimHorizon
      case QueueConfig.StartFromLatest => StartingPosition.Latest
      case other => throw new IllegalArgumentException(
        s"Invalid InitialStreamPosition: $other")
    }
  }

  /** ST3 — `GetShardIteratorAsync` (`KinesisThreadJobs.cs:629-682`): an
    * invalid saved sequence clears the checkpoint and retries once from
    * the initial position; all other errors preserve it and propagate.
    */
  def shardIteratorWithReset(api: KinesisApi, store: CheckpointStore,
      queue: QueueConfig, queueId: String, shardId: String,
      ignoreCheckpoint: Boolean = false): String = {
    val cp =
      if (ignoreCheckpoint) None
      else store.getCheckpoint(queue.streamName, queueId, shardId)
    try api.getShardIterator(queue.streamName, shardId,
      startingPosition(cp, queue))
    catch {
      case e: InvalidArgumentException
          if e.getMessage.contains("StartingSequenceNumber") &&
            !ignoreCheckpoint =>
        store.clearCheckpoint(queue.streamName, queueId, shardId)
        shardIteratorWithReset(api, store, queue, queueId, shardId,
          ignoreCheckpoint = true)
    }
  }

  private def deliverBatch(records: Seq[FetchedRecord], sink: RecordSink,
      queue: QueueConfig, sleep: Long => Unit): Unit =
    records.foreach { r =>
      Backoff.withRetry(queue.maxRetries, queue.errorBackoffTime.toDouble,
        sleep) { () =>
        if (!sink.deliver(r))
          throw new RuntimeException(
            s"Failed to process message: ${r.sequenceNumber}")
      }
    }

  /** S1 — `ProcessShardWithPollingAsync` (`KinesisThreadJobs.cs:327-440`).
    *
    * `maxEmptyPolls` bounds consecutive empty responses before returning
    * un-closed — the test-harness analog of the reference's cancellation
    * token (its loop idles forever on an open, quiet shard).
    */
  def pollShard(api: KinesisApi, store: CheckpointStore, queue: QueueConfig,
      queueId: String, shardId: String, sink: RecordSink,
      sleep: Long => Unit = Thread.sleep,
      stop: () => Boolean = () => false,
      maxEmptyPolls: Int = Int.MaxValue): ShardPass = {
    var iterator = shardIteratorWithReset(api, store, queue, queueId, shardId)
    var delivered = 0L
    var emptyPolls = 0
    while (!stop()) {
      val resp = Backoff.withRetry(queue.maxRetries,
        queue.errorBackoffTime.toDouble, sleep) { () =>
        api.getRecords(iterator, queue.maxRecordsPerRequest)
      }
      if (resp.records.nonEmpty) {
        emptyPolls = 0
        deliverBatch(resp.records, sink, queue, sleep)
        delivered += resp.records.size
        // checkpoint = last FETCHED record (`KinesisThreadJobs.cs:404-408`)
        store.saveCheckpoint(queue.streamName, queueId, shardId,
          resp.records.last.sequenceNumber)
      } else emptyPolls += 1
      // the close check comes BEFORE the idle budget, as in the reference
      // (`:415-419` breaks on the null iterator right after processing) —
      // an empty final poll on a closed shard must still report closure
      resp.nextShardIterator match {
        case None => return ShardPass(closed = true, delivered) // shard end
        case Some(next) => iterator = next
      }
      if (emptyPolls >= maxEmptyPolls)
        return ShardPass(closed = false, delivered)
      // pacing (`KinesisThreadJobs.cs:423-432`): a short batch means the
      // shard is caught up → long poll interval; a full batch means there
      // is more to read → short batch wait
      if (resp.records.size < queue.maxRecordsPerRequest)
        sleep(queue.shardPollInterval * 1000L)
      else sleep(queue.shardBatchWaitTime * 1000L)
    }
    ShardPass(closed = false, delivered)
  }

  /** S2 — `ProcessShardWithEnhancedFanOutAsync`
    * (`KinesisThreadJobs.cs:442-531`): ONE subscription; checkpoint after
    * each non-empty event; null continuation = shard closed; subscription
    * end without it returns un-closed (the acquire sweep resubscribes from
    * the checkpoint).
    */
  def efoShard(api: KinesisApi, store: CheckpointStore, queue: QueueConfig,
      queueId: String, shardId: String, consumerArn: String,
      sink: RecordSink, sleep: Long => Unit = Thread.sleep,
      stop: () => Boolean = () => false): ShardPass = {
    val cp = store.getCheckpoint(queue.streamName, queueId, shardId)
    val events = Backoff.withRetry(queue.maxRetries,
      queue.errorBackoffTime.toDouble, sleep) { () =>
      api.subscribeToShard(consumerArn, queue.streamName, shardId,
        startingPosition(cp, queue))
    }
    var delivered = 0L
    while (events.hasNext && !stop()) {
      val ev = events.next()
      if (ev.records.nonEmpty) {
        deliverBatch(ev.records, sink, queue, sleep)
        delivered += ev.records.size
        store.saveCheckpoint(queue.streamName, queueId, shardId,
          ev.records.last.sequenceNumber)
      }
      if (ev.continuationSequenceNumber.isEmpty)
        return ShardPass(closed = true, delivered)
    }
    ShardPass(closed = false, delivered)
  }

  /** `ReceiveMessages` + `ProcessShardAsync` (`KinesisThreadJobs
    * .cs:220-322`), run as deterministic sequential sweeps: discover
    * shards, lease-acquire each, process (EFO or polling), release the
    * lease in `finally`. A shard whose pass did not close it is retried on
    * the next sweep — which is precisely where EFO continuation-resume
    * happens. Returns total records delivered.
    */
  def runQueue(api: KinesisApi, store: CheckpointStore, queue: QueueConfig,
      queueId: String, threadId: String, sink: RecordSink,
      sleep: Long => Unit = Thread.sleep,
      maxSweeps: Int = 1,
      maxEmptyPolls: Int = 1): Long = {
    QueueConfig.requireValid(queue)
    val consumerArn =
      if (queue.useEnhancedFanOut) resolveConsumerArn(api, queue, sleep)
      else null
    val closedShards = mutable.Set.empty[String]
    var delivered = 0L
    var sweep = 0
    while (sweep < maxSweeps) {
      val shards = api.describeStream(queue.streamName).shards
      shards.foreach { s =>
        if (!closedShards(s.shardId) &&
            store.acquireLease(queue.streamName, queueId, s.shardId,
              threadId)) {
          try {
            val pass =
              if (queue.useEnhancedFanOut)
                efoShard(api, store, queue, queueId, s.shardId, consumerArn,
                  sink, sleep)
              else pollShard(api, store, queue, queueId, s.shardId, sink,
                sleep, maxEmptyPolls = maxEmptyPolls)
            delivered += pass.delivered
            if (pass.closed) closedShards += s.shardId
          } finally {
            store.releaseLease(queue.streamName, queueId, s.shardId)
          }
        }
      }
      sweep += 1
      if (closedShards.size == api.describeStream(queue.streamName)
          .shards.size)
        return delivered // every shard ended — nothing left to sweep
    }
    delivered
  }
}

/** [[RecordSource]] backed by the transport loops: each [[pump]] runs the
  * lease→poll/EFO→checkpoint→release cycle against the [[KinesisApi]] and
  * feeds the fetched envelopes into a memory stream the engine pipeline
  * consumes. This is the drop-in seam a real connector would occupy —
  * the engine side ([[QueueRuntime.start]]) is identical either way.
  */
final class FakeKinesisRecordSource(api: KinesisApi, queue: QueueConfig,
    store: CheckpointStore, queueId: String = "q1",
    threadId: String = "pump-0") extends RecordSource {
  import org.apache.spark.sql.{Dataset, SparkSession}
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import graft.model.KinesisRecord

  private var mem: MemoryStream[KinesisRecord] = _

  override def stream(spark: SparkSession): Dataset[KinesisRecord] = {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    mem = MemoryStream[KinesisRecord]
    mem.toDS()
  }

  /** One transport sweep; returns records pumped into the stream. */
  def pump(sleep: Long => Unit = _ => (), maxSweeps: Int = 1): Long = {
    val buf = Vector.newBuilder[KinesisRecord]
    val sink = new RecordSink {
      override def deliver(r: FetchedRecord): Boolean = {
        buf += KinesisRecord(r.data, r.partitionKey, r.sequenceNumber,
          java.sql.Timestamp.from(r.approximateArrivalTimestamp), null)
        true
      }
    }
    val n = ShardConsumer.runQueue(api, store, queue, queueId, threadId,
      sink, sleep, maxSweeps)
    val recs = buf.result()
    if (recs.nonEmpty) mem.addData(recs)
    n
  }
}
