package graft.streaming

import java.time.Instant
import scala.collection.mutable

import graft.config.QueueConfig
import graft.functions.Backoff
import graft.state.CheckpointStore

/** The transport seam (S2/S3/S4/S5) — the six RPCs the reference's shard
  * jobs actually issue against AWS Kinesis, plus an in-memory scripted
  * implementation so the EFO subscribe/continuation and
  * checkpoint-invalidation control flow EXECUTES under spec instead of
  * existing only as option maps.
  *
  * Reference call sites:
  *   - `DescribeStream` — shard discovery + stream ARN
  *     (`KinesisThreadJobs.cs:200-218,183-199`)
  *   - `DescribeStreamConsumer` — consumer-name → ARN resolution
  *     (`KinesisThreadJobs.cs:162-181`)
  *   - `GetShardIterator` — start-position resolution with
  *     checkpoint-invalidation retry (`KinesisThreadJobs.cs:629-682`)
  *   - `GetRecords` — polling loop (`KinesisThreadJobs.cs:348-440`)
  *   - `SubscribeToShard` — EFO push loop (`KinesisThreadJobs.cs:442-531`)
  *
  * A real AWS connector implements [[KinesisApi]] with SDK calls; the specs
  * drive [[FakeKinesisService]]. [[ShardConsumer]] is the shared control
  * flow and does not know which one it talks to.
  */
sealed trait StartingPosition
object StartingPosition {
  /** `ShardIteratorType.TRIM_HORIZON` — "Start from oldest record". */
  case object TrimHorizon extends StartingPosition
  /** `ShardIteratorType.LATEST` — "Start from latest record". */
  case object Latest extends StartingPosition
  /** `ShardIteratorType.AFTER_SEQUENCE_NUMBER` — resume after checkpoint. */
  final case class AfterSequenceNumber(sequenceNumber: String)
    extends StartingPosition
}

final case class ShardInfo(shardId: String)
final case class StreamDescription(streamArn: String, shards: Seq[ShardInfo])

/** One fetched record — the AWS `Record` fields the reference projects
  * (`KinesisThreadJobs.cs:685-692`, `KinesisUtils.cs:146-183`).
  */
final case class FetchedRecord(
    sequenceNumber: String,
    partitionKey: String,
    data: Array[Byte],
    approximateArrivalTimestamp: Instant)

final case class GetRecordsResult(
    records: Seq[FetchedRecord],
    /** None ⇔ shard closed and fully consumed (`KinesisThreadJobs
      * .cs:415-419` breaks on a null/empty next iterator). */
    nextShardIterator: Option[String])

/** One EFO event-stream element (`SubscribeToShardEvent`). */
final case class SubscribeEvent(
    records: Seq[FetchedRecord],
    /** None ⇔ shard closed (`KinesisThreadJobs.cs:514-518` breaks). */
    continuationSequenceNumber: Option[String])

/** `Amazon.Kinesis.Model.InvalidArgumentException` twin. The reference
  * dispatches on `ex.Message.Contains("StartingSequenceNumber")`
  * (`KinesisThreadJobs.cs:667`), so the message carries the field name.
  */
final class InvalidArgumentException(msg: String)
  extends IllegalArgumentException(msg)

trait KinesisApi {
  def describeStream(streamName: String): StreamDescription
  /** Returns the consumer ARN (`DescribeStreamConsumerAsync`). */
  def describeStreamConsumer(streamArn: String, consumerName: String): String
  def getShardIterator(streamName: String, shardId: String,
      position: StartingPosition): String
  def getRecords(shardIterator: String, limit: Int): GetRecordsResult
  /** One subscription's event stream. The returned iterator ENDS when the
    * server closes the subscription (AWS does so every 5 minutes); the
    * caller resumes from its checkpoint, as the reference does via its
    * lease-reacquire sweep.
    */
  def subscribeToShard(consumerArn: String, streamName: String,
      shardId: String, position: StartingPosition): Iterator[SubscribeEvent]
}

/** Scripted in-memory Kinesis. Thread-safe; all mutation is synchronized.
  *
  * Scripting hooks: [[closeShard]] (seal a shard — readers see the
  * close via null next-iterator / null continuation), [[trimBelow]]
  * (expire old sequences so checkpoints pointing at them become invalid —
  * the ST3 trigger), [[throttleNext]] (next N data-plane calls throw the
  * throttled service error — the E1/E2 trigger), and
  * `maxEventsPerSubscription` (server-side subscription cap — the AWS
  * 5-minute window analog that forces continuation resume).
  */
final class FakeKinesisService extends KinesisApi {
  private final class ShardState {
    val records = mutable.ArrayBuffer.empty[FetchedRecord]
    var nextSeq: Long = 1000000L
    var trimmedBelow: Long = 1000000L
    var closed: Boolean = false
  }
  private val streams =
    mutable.Map.empty[String, mutable.LinkedHashMap[String, ShardState]]
  private val consumers = mutable.Map.empty[(String, String), String]
  private var throttleBudget = 0
  /** Events a single subscription may emit before the server ends it. */
  @volatile var maxEventsPerSubscription: Int = Int.MaxValue
  /** Records per EFO event (server-chosen batch size on AWS). */
  @volatile var efoBatchSize: Int = 100

  def createStream(name: String, shardIds: Seq[String]): Unit = synchronized {
    val m = mutable.LinkedHashMap.empty[String, ShardState]
    shardIds.foreach(id => m(id) = new ShardState)
    streams(name) = m
  }

  def registerStreamConsumer(streamName: String, consumerName: String): String =
    synchronized {
      val arn = s"arn:fake:kinesis:stream/$streamName/consumer/$consumerName"
      consumers((streamArnOf(streamName), consumerName)) = arn
      arn
    }

  def putRecord(streamName: String, shardId: String, partitionKey: String,
      data: Array[Byte],
      arrival: Instant = Instant.EPOCH): String = synchronized {
    val sh = shard(streamName, shardId)
    require(!sh.closed, s"shard $shardId is closed")
    val seq = sh.nextSeq.toString
    sh.records += FetchedRecord(seq, partitionKey, data, arrival)
    sh.nextSeq += 1
    seq
  }

  def closeShard(streamName: String, shardId: String): Unit =
    synchronized { shard(streamName, shardId).closed = true }

  /** Reshard: split an open shard into two new children — the parent is
    * sealed (readers drain its residue and see the close) and the
    * children appear in subsequent DescribeStream responses, which is
    * what the reference's `ShardPollInterval` rescan exists to pick up
    * (`KinesisThreadJobs.cs:230-281`; close detect `:417-421`). AWS
    * routes the parent's hash-key range to the children; the fake keeps
    * routing scripted — the test writes to whichever child it means.
    */
  def splitShard(streamName: String, parent: String, child1: String,
      child2: String): Unit = synchronized {
    val m = streams.getOrElse(streamName,
      throw new IllegalArgumentException(s"no such stream: $streamName"))
    val p = shard(streamName, parent)
    require(!p.closed, s"cannot split closed shard $parent")
    require(!m.contains(child1) && !m.contains(child2),
      s"child shard id already exists: $child1/$child2")
    p.closed = true
    m(child1) = new ShardState
    m(child2) = new ShardState
  }

  /** Reshard: merge two open shards — both parents seal, one new child
    * appears on the next DescribeStream (the split's inverse; same
    * rescan-pickup contract).
    */
  def mergeShards(streamName: String, parent1: String, parent2: String,
      child: String): Unit = synchronized {
    val m = streams.getOrElse(streamName,
      throw new IllegalArgumentException(s"no such stream: $streamName"))
    val p1 = shard(streamName, parent1)
    val p2 = shard(streamName, parent2)
    require(!p1.closed && !p2.closed,
      s"cannot merge closed shard $parent1/$parent2")
    require(!m.contains(child), s"child shard id already exists: $child")
    p1.closed = true
    p2.closed = true
    m(child) = new ShardState
  }

  /** Expire every sequence < `belowSeq` (retention passing / stream reset).
    * A checkpoint pointing into the trimmed range becomes invalid, which is
    * exactly the ST3 trigger. */
  def trimBelow(streamName: String, shardId: String, belowSeq: String): Unit =
    synchronized {
      val sh = shard(streamName, shardId)
      sh.trimmedBelow = math.max(sh.trimmedBelow, belowSeq.toLong)
      sh.records.filterInPlace(_.sequenceNumber.toLong >= sh.trimmedBelow)
    }

  /** Next `n` GetRecords/SubscribeToShard calls throw the throttled
    * service error (`ProvisionedThroughputExceededException` twin). */
  def throttleNext(n: Int): Unit = synchronized { throttleBudget += n }

  private def shard(streamName: String, shardId: String): ShardState =
    streams.getOrElse(streamName,
        throw new IllegalArgumentException(s"no such stream: $streamName"))
      .getOrElse(shardId,
        throw new IllegalArgumentException(s"no such shard: $shardId"))

  private def streamArnOf(name: String) = s"arn:fake:kinesis:stream/$name"

  private def maybeThrottle(): Unit = synchronized {
    if (throttleBudget > 0) {
      throttleBudget -= 1
      throw new Backoff.RetryableException(
        "Rate exceeded for shard", 400, throttled = true)
    }
  }

  /** Start position → absolute sequence cursor; the AFTER branch throws the
    * reference-shaped invalid-argument error when the checkpoint has been
    * trimmed out of range (`KinesisThreadJobs.cs:667`: dispatched on the
    * message containing "StartingSequenceNumber"). */
  private def resolve(sh: ShardState, position: StartingPosition): Long =
    position match {
      case StartingPosition.TrimHorizon => sh.trimmedBelow
      case StartingPosition.Latest => sh.nextSeq
      case StartingPosition.AfterSequenceNumber(s) =>
        val seq = s.toLong
        if (seq < sh.trimmedBelow || seq >= sh.nextSeq)
          throw new InvalidArgumentException(
            s"StartingSequenceNumber $s used in GetShardIterator on " +
              "shard is invalid")
        seq + 1
    }

  override def describeStream(streamName: String): StreamDescription =
    synchronized {
      val m = streams.getOrElse(streamName,
        throw new IllegalArgumentException(s"no such stream: $streamName"))
      StreamDescription(streamArnOf(streamName),
        m.keys.map(ShardInfo(_)).toSeq)
    }

  override def describeStreamConsumer(streamArn: String,
      consumerName: String): String = synchronized {
    consumers.getOrElse((streamArn, consumerName),
      throw new IllegalArgumentException(
        s"Consumer $consumerName not found on $streamArn"))
  }

  override def getShardIterator(streamName: String, shardId: String,
      position: StartingPosition): String = synchronized {
    val cursor = resolve(shard(streamName, shardId), position)
    s"iter|$streamName|$shardId|$cursor"
  }

  override def getRecords(shardIterator: String,
      limit: Int): GetRecordsResult = synchronized {
    maybeThrottle()
    val Array(_, streamName, shardId, cur) = shardIterator.split('|')
    val sh = shard(streamName, shardId)
    val cursor = cur.toLong
    val recs = sh.records
      .filter(_.sequenceNumber.toLong >= cursor).take(limit).toSeq
    val nextCursor =
      if (recs.isEmpty) cursor else recs.last.sequenceNumber.toLong + 1
    val drained = nextCursor >= sh.nextSeq
    val next =
      if (sh.closed && drained) None
      else Some(s"iter|$streamName|$shardId|$nextCursor")
    GetRecordsResult(recs, next)
  }

  override def subscribeToShard(consumerArn: String, streamName: String,
      shardId: String,
      position: StartingPosition): Iterator[SubscribeEvent] = synchronized {
    maybeThrottle()
    require(consumers.valuesIterator.contains(consumerArn),
      s"unknown consumer ARN: $consumerArn") // EFO requires registration
    val sh = shard(streamName, shardId)
    var cursor = resolve(sh, position)
    val cap = maxEventsPerSubscription
    val batch = efoBatchSize
    var emitted = 0
    var done = false
    new Iterator[SubscribeEvent] {
      override def hasNext: Boolean = FakeKinesisService.this.synchronized {
        !done && emitted < cap &&
          (cursor < sh.nextSeq || sh.closed)
      }
      override def next(): SubscribeEvent =
        FakeKinesisService.this.synchronized {
          val recs = sh.records
            .filter(_.sequenceNumber.toLong >= cursor).take(batch).toSeq
          if (recs.nonEmpty) cursor = recs.last.sequenceNumber.toLong + 1
          emitted += 1
          val drained = cursor >= sh.nextSeq
          if (sh.closed && drained) {
            done = true
            SubscribeEvent(recs, None)
          } else {
            SubscribeEvent(recs, Some((cursor - 1).toString))
          }
        }
    }
  }
}
