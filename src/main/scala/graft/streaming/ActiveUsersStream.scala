package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.pipeline.EventWindows
import graft.streaming.IncrementalDedupStream.readParts

/** Streaming twin of `w_active_users` — the trailing-window
  * distinct-active-users series (DAU/WAU) maintained as events ARRIVE,
  * exact under ANY batch split. Completes the windowing family: every
  * registered `w_*` operator now has a streaming counterpart.
  *
  * State is the single idempotent-mergeable statistic the batch fold
  * consumes: the DISTINCT (user_id, day) activity set, merged by set
  * union (the [[RetentionStream]] `act` discipline) — bounded by
  * users × observed days, never by event count. Two retroactive cases
  * fall out of re-deriving through the SAME
  * [[EventWindows.rollingActiveUsersFromPairs]] fold: a late event in
  * an OLD day adds its user to up to `windowDays` earlier report days,
  * and a late event in a previously-UNOBSERVED day makes that report
  * day exist at all (observed-day semantics) — both beyond per-day
  * counter state. Replay and out-of-order arrival are absorbed by the
  * union merge itself; the `batch=<id>` overwrite partitions are kept
  * as the family convention.
  *
  * Steady-state cost per micro-batch: one batch-sized distinct
  * projection. The view is one distinct over user×days-bounded state,
  * then the batch fold (bounded explode + broadcast semi join +
  * distinct count — never a range join).
  */
object ActiveUsersStream {
  private val PairSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("day", LongType)))

  /** One micro-batch: the batch's distinct (user, day) pairs into this
    * batch's partition. Public so the spec drives the identical body
    * without a stream (the family convention).
    */
  def ingestBatch(batch: DataFrame, batchId: Long, root: String): Unit =
    batch.select(col("user_id"), graft.TimeBuckets.epochDay().as("day"))
      .distinct()
      .write.mode("overwrite").parquet(s"$root/pairs/batch=$batchId")

  /** The cumulative series — shaped exactly like the batch
    * `w_active_users`: (report_day, active_users).
    */
  def activeUsers(spark: SparkSession, root: String,
      windowDays: Int = 7): DataFrame =
    EventWindows.rollingActiveUsersFromPairs(
      readParts(spark, s"$root/pairs", -1L, PairSchema).distinct(),
      windowDays)

  /** Start the ingest on a streaming events frame. */
  def start(events: DataFrame, root: String,
      checkpoint: String): StreamingQuery = {
    val body: (DataFrame, Long) => Unit =
      (b, id) => ingestBatch(b, id, root)
    events.writeStream
      .foreachBatch(body)
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
