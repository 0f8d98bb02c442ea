package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming twin of [[graft.pipeline.EventWindows.funnel]]: per-user
  * ordered-stage progression maintained incrementally over an unbounded
  * event stream.
  *
  * State per user is the sorted timestamp list of each stage's events
  * seen so far; every batch folds its arrivals in and re-derives the
  * greedy chain (stage i = earliest stage-i event strictly after stage
  * i−1). Keeping the per-stage lists — not just the current chain — is
  * what makes the operator EXACT under arbitrary batch splits and
  * arrival order: a late-arriving early event (the signup that reaches
  * us after the purchase) re-anchors the chain retroactively, which a
  * chain-only state could never recover. The cost is state proportional
  * to each user's funnel-type events — human-action counts, small by
  * construction; the chain recompute is O(#stages · log n) per touched
  * user per batch.
  *
  * Emits the user's current stage-times vector after every batch that
  * touched the user (update semantics — downstream upserts by user;
  * fold the final vectors into stage counts for the w_funnel shape).
  */
object FunnelStream {
  case class FunnelEvent(userId: Long, eventType: String, tsUs: Long)
  case class UserFunnel(userId: Long, stageTs: Seq[Long])

  /** Greedy chain over sorted per-stage timestamp lists: stage i's time
    * is the earliest entry strictly after stage i−1's; the chain stops
    * at the first stage with no qualifying event. Shared by the
    * operator and the spec's sequential ground truth.
    */
  def chain(lists: Seq[Seq[Long]]): Seq[Long] = {
    val out = Seq.newBuilder[Long]
    var prev = Long.MinValue
    var continue = true
    for (l <- lists if continue) l.find(_ > prev) match {
      case Some(t) => out += t; prev = t
      case None => continue = false
    }
    out.result()
  }

  def funnelStages(ds: Dataset[FunnelEvent], stages: Seq[String],
      spark: SparkSession): Dataset[UserFunnel] = {
    import spark.implicits._
    val idx = stages.zipWithIndex.toMap
    ds.filter(e => idx.contains(e.eventType))
      .groupByKey(_.userId)
      .mapGroupsWithState[Seq[Seq[Long]], UserFunnel](
        GroupStateTimeout.NoTimeout) { (user, rows, state) =>
        val cur = state.getOption
          .getOrElse(Seq.fill(stages.size)(Seq.empty[Long]))
        val arrived = rows.toSeq.groupBy(e => idx(e.eventType))
        val next = cur.zipWithIndex.map { case (l, i) =>
          arrived.get(i) match {
            case Some(es) => (l ++ es.map(_.tsUs)).sorted
            case None => l
          }
        }
        state.update(next)
        UserFunnel(user, chain(next))
      }
  }
}
