package graft.state

import java.time.Instant
import scala.collection.mutable

/** One checkpoint/lease row — the engine twin of the `kinesis_checkpoint`
  * entity (`Decisions.Kinesis/KinesisCheckPoint.cs:15-78`): composite id
  * `{streamName}_{queueId}_{shardId}`, last processed sequence, lease owner
  * and expiry.
  */
final case class Checkpoint(
    streamName: String,
    queueId: String,
    shardId: String,
    sequenceNumber: Option[String],
    lastProcessedTimestamp: Option[Instant],
    leaseOwner: Option[String],
    leaseExpirationTime: Option[Instant]) {
  def id: String = CheckpointStore.checkpointId(streamName, queueId, shardId)
}

/** In-memory, thread-safe checkpoint + lease store reproducing the observable
  * state machine of `Decisions.Kinesis/KinesisCheckPointer.cs`.
  *
  * In a Spark deployment this role is played by the Structured Streaming
  * offset log (`checkpointLocation`): the driver owns partition assignment,
  * so cross-node lease arbitration is unnecessary (SURVEY §2.6 ST4-ST6). The
  * store exists so the delivery contract — exclusive per-shard ownership,
  * at-least-once, resume-after-last-commit — is unit-testable and usable by
  * the local streaming runtime.
  *
  * `now` is injectable for deterministic tests (the reference uses
  * `DateTime.UtcNow` throughout).
  */
final class CheckpointStore(now: () => Instant = () => Instant.now()) {
  import CheckpointStore._

  private val rows = mutable.Map.empty[String, Checkpoint]

  /** `AcquireLease` (`KinesisCheckPointer.cs:18-95`) truth table:
    *   - no row            → insert (owner, now+TTL), true
    *   - valid lease, own  → renew expiry, true
    *   - valid lease, other→ false
    *   - expired           → atomically replace preserving sequence, true
    *     (the DB unique-constraint race collapses to the synchronized block
    *     here; a concurrent winner makes the loser return false).
    */
  def acquireLease(streamName: String, queueId: String, shardId: String,
      threadId: String): Boolean = synchronized {
    val id = checkpointId(streamName, queueId, shardId)
    val t = now()
    rows.get(id) match {
      case None =>
        rows(id) = Checkpoint(streamName, queueId, shardId, None, None,
          Some(threadId), Some(t.plusSeconds(LeaseTtlSeconds)))
        true
      // NOTE deliberate parity quirk: a just-RELEASED lease (owner=None,
      // expiry=now) is unacquirable until the next tick, because the
      // reference's validity check is `LeaseExpirationTime >= UtcNow`
      // and its valid-branch returns false for any non-matching owner —
      // including null (`KinesisCheckPointer.cs:46-62`). The spec's
      // release test advances the clock for exactly this reason.
      case Some(cp) if cp.leaseExpirationTime.exists(!_.isBefore(t)) =>
        if (cp.leaseOwner.contains(threadId)) {
          rows(id) = cp.copy(
            leaseExpirationTime = Some(t.plusSeconds(LeaseTtlSeconds)))
          true
        } else false
      case Some(cp) => // expired — take over, preserving the sequence
        rows(id) = cp.copy(leaseOwner = Some(threadId),
          leaseExpirationTime = Some(t.plusSeconds(LeaseTtlSeconds)))
        true
    }
  }

  /** `SaveCheckpoint` (`KinesisCheckPointer.cs:97-129`): upsert sequence +
    * processing timestamp, extending the lease.
    */
  def saveCheckpoint(streamName: String, queueId: String, shardId: String,
      sequenceNumber: String): Unit = synchronized {
    val id = checkpointId(streamName, queueId, shardId)
    val t = now()
    val base = rows.getOrElse(id,
      Checkpoint(streamName, queueId, shardId, None, None, None, None))
    rows(id) = base.copy(sequenceNumber = Some(sequenceNumber),
      lastProcessedTimestamp = Some(t),
      leaseExpirationTime = Some(t.plusSeconds(LeaseTtlSeconds)))
  }

  /** `GetCheckpoint` (`KinesisCheckPointer.cs:131-159`). */
  def getCheckpoint(streamName: String, queueId: String,
      shardId: String): Option[String] = synchronized {
    rows.get(checkpointId(streamName, queueId, shardId))
      .flatMap(_.sequenceNumber)
  }

  /** Checkpoint invalidation (ST3, `KinesisThreadJobs.cs:667-674`): an
    * out-of-range sequence resets to the initial position.
    */
  def clearCheckpoint(streamName: String, queueId: String,
      shardId: String): Unit = synchronized {
    rows.updateWith(checkpointId(streamName, queueId, shardId))(
      _.map(_.copy(sequenceNumber = None)))
  }

  /** `ReleaseLease` (`KinesisCheckPointer.cs:161-191`): null owner, expire
    * immediately; sequence survives for the next owner.
    */
  def releaseLease(streamName: String, queueId: String,
      shardId: String): Unit = synchronized {
    rows.updateWith(checkpointId(streamName, queueId, shardId))(
      _.map(_.copy(leaseOwner = None,
        leaseExpirationTime = Some(now()))))
  }

  /** Shutdown twin of `ReleaseAllLeases` for the engine's runtime, which
    * extends leases via [[saveCheckpoint]] WITHOUT per-thread ownership
    * (Spark's driver owns partition assignment): expire every lease of
    * the queue so a successor runtime can start immediately.
    */
  def releaseQueueLeases(streamName: String, queueId: String): Unit =
    synchronized {
      rows.keys.toSeq.foreach { id =>
        rows.updateWith(id)(_.map { cp =>
          if (cp.streamName == streamName && cp.queueId == queueId)
            cp.copy(leaseOwner = None, leaseExpirationTime = Some(now()))
          else cp
        })
      }
    }

  /** `ReleaseAllLeases` (`KinesisCheckPointer.cs:193-220`) — shutdown path. */
  def releaseAllLeases(streamName: String, queueId: String,
      threadId: String): Unit = synchronized {
    rows.keys.toSeq.foreach { id =>
      rows.updateWith(id)(_.map { cp =>
        if (cp.streamName == streamName && cp.queueId == queueId &&
            cp.leaseOwner.contains(threadId))
          cp.copy(leaseOwner = None, leaseExpirationTime = Some(now()))
        else cp
      })
    }
  }

  def snapshot: Map[String, Checkpoint] = synchronized(rows.toMap)
}

object CheckpointStore {
  /** `KinesisCheckPointer.cs:11` — 1-minute lease TTL. */
  val LeaseTtlSeconds = 60L

  /** `{streamName}_{queueId}_{shardId}` (`KinesisCheckPointer.cs:13-16`,
    * `KinesisCheckPoint.cs:78`). */
  def checkpointId(streamName: String, queueId: String, shardId: String): String =
    s"${streamName}_${queueId}_${shardId}"
}
