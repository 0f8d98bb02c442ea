package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.pipeline.EventWindows
import graft.streaming.IncrementalDedupStream.readParts

/** Streaming twin of `w_retention` — the weekly cohort retention
  * matrix maintained as events ARRIVE, exact under ANY batch split and
  * arrival order. The interesting case is RETROACTIVE RE-COHORTING: a
  * late-arriving cohort event from an EARLIER week lowers a user's
  * first-cohort week, which moves every one of their (cohort_week,
  * week_offset) contributions at once — per-cell counter state could
  * never recover that, so the state is two idempotent-mergeable
  * statistics instead (the MixReportStream sufficient-statistic
  * discipline, with MERGE operators richer than addition):
  *
  *  - `act`: DISTINCT (user_id, wk) activity pairs — merged by set
  *    union (the view's `distinct()`), bounded by users × observed
  *    weeks, never by event count;
  *  - `coh`: per-user MIN first-cohort-week candidates — merged by
  *    `min`, ≤ one row per user per batch.
  *
  * Both merges are idempotent AND commutative, so replayed batches and
  * out-of-order arrival are absorbed by construction (the `batch=<id>`
  * overwrite partitions are kept anyway — the family convention — but
  * unlike the additive-counter twins nothing here even relies on
  * them). The view feeds the merged statistics through the SAME
  * [[EventWindows.retentionFrom]] fold the batch operator uses, so
  * stream ≡ batch exactly (RetentionStreamSpec pins the split
  * equality, the retroactive re-cohort, replay, and the wiring).
  *
  * Steady-state cost per micro-batch: two batch-sized map-side-combined
  * aggregates; the view is one distinct + one min-aggregate over
  * user-bounded state, then the (cohort, offset)-sized fold.
  */
object RetentionStream {
  private val ActSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("wk", LongType)))
  private val CohSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("cw", LongType)))

  /** One micro-batch: the batch's distinct activity pairs and per-user
    * cohort-week candidates into this batch's partitions. Public so
    * the spec drives the identical body without a stream.
    */
  def ingestBatch(batch: DataFrame, batchId: Long, root: String,
      cohortType: String): Unit = {
    val wk = graft.TimeBuckets.epochWeek()
    batch.select(col("user_id"), wk.as("wk")).distinct()
      .write.mode("overwrite").parquet(s"$root/act/batch=$batchId")
    batch.filter(col("event_type") === cohortType)
      .groupBy("user_id").agg(min(wk).as("cw"))
      .write.mode("overwrite").parquet(s"$root/coh/batch=$batchId")
  }

  /** The cumulative retention matrix — shaped exactly like the batch
    * `w_retention`: (cohort_week, week_offset, n_users).
    */
  def retention(spark: SparkSession, root: String): DataFrame =
    EventWindows.retentionFrom(
      readParts(spark, s"$root/coh", -1L, CohSchema)
        .groupBy("user_id").agg(min(col("cw")).as("cw")),
      readParts(spark, s"$root/act", -1L, ActSchema).distinct())

  /** Start the ingest on a streaming events frame. */
  def start(events: DataFrame, root: String, checkpoint: String,
      cohortType: String): StreamingQuery = {
    val body: (DataFrame, Long) => Unit =
      (b, id) => ingestBatch(b, id, root, cohortType)
    events.writeStream
      .foreachBatch(body)
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
