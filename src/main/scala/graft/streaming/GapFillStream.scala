package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType, TimestampType}

import graft.pipeline.EventWindows
import graft.streaming.IncrementalDedupStream.readPartsWithBatch

/** Streaming twin of `w_gapfill` — the densified hourly rate series
  * maintained as events ARRIVE. State is the hourly count table itself,
  * written as per-batch increments: hourly counts are ADDITIVE across
  * any partition of the stream into batches, so per-batch work is one
  * batch-sized aggregate, and the view re-densifies the summed counts
  * through the SAME `densifyHourly` the batch operator uses — the grid
  * (and therefore zero-row semantics) cannot drift between the two.
  *
  * Late data needs no special case: an event landing in an old (or
  * pre-range) hour just increments that hour's count, and the next
  * view re-derivation extends/refills the grid retroactively — the
  * count table is calendar × types sized, so full re-densification per
  * read is bounded regardless of stream length. Emissions land in
  * `batch=<id>` overwrite partitions (the family's idempotent replay
  * discipline — re-processing a batch rewrites the identical
  * increment).
  */
object GapFillStream {
  private val CountSchema = StructType(Seq(
    StructField("event_type", StringType),
    StructField("h", TimestampType),
    StructField("n0", LongType)))

  /** Ingest one micro-batch of raw events (event_type, ts, …). Public
    * so the spec drives the identical body without a stream (the
    * family convention); wire via `foreachBatch(ingestBatch(_, _, path))`.
    */
  def ingestBatch(events: DataFrame, batchId: Long,
      outPath: String): Unit =
    EventWindows.hourlyCounts(events)
      .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")

  /** The stream's current answer — shaped exactly like `w_gapfill`. */
  def view(spark: SparkSession, outPath: String): DataFrame = {
    val counts = readPartsWithBatch(spark, outPath, -1L, CountSchema)
      .groupBy("event_type", "h").agg(sum(col("n0")).as("n0"))
    EventWindows.densifyHourly(counts)
  }

  /** The smoothed answer — shaped exactly like `w_ema`. Same shared-
    * machinery argument: the summed increments ARE an hourlyCounts
    * frame, and [[EventWindows.emaFromCounts]] is the identical code
    * path the batch operator runs, so stream ≡ batch holds by
    * construction for any split (EmaStream part of GapFillStreamSpec).
    */
  def emaView(spark: SparkSession, outPath: String): DataFrame = {
    val counts = readPartsWithBatch(spark, outPath, -1L, CountSchema)
      .groupBy("event_type", "h").agg(sum(col("n0")).as("n0"))
    EventWindows.emaFromCounts(counts)
  }

  /** The sustained-shift answer — shaped exactly like `w_cusum` (note
    * μ is series-relative, so a batch that extends the series can
    * retroactively re-evaluate earlier flags: exactly what the batch
    * operator would say on the union, which is the twin contract).
    */
  def cusumView(spark: SparkSession, outPath: String): DataFrame = {
    val counts = readPartsWithBatch(spark, outPath, -1L, CountSchema)
      .groupBy("event_type", "h").agg(sum(col("n0")).as("n0"))
    EventWindows.cusumFromCounts(counts)
  }

  /** The adaptive spike-flag answer — shaped exactly like
    * `w_ema_anomaly` (same shared-machinery argument as [[emaView]]:
    * the SAME emaAnomalyFromCounts the batch operator runs, so a late
    * batch that shifts the smoothed baseline retroactively re-evaluates
    * flags — exactly the batch answer on the union, the twin contract).
    */
  def emaAnomalyView(spark: SparkSession, outPath: String): DataFrame = {
    val counts = readPartsWithBatch(spark, outPath, -1L, CountSchema)
      .groupBy("event_type", "h").agg(sum(col("n0")).as("n0"))
    EventWindows.emaAnomalyFromCounts(counts)
  }

  /** The two-sided sustained-shift answer — shaped exactly like
    * `w_cusum_twosided` (same parameterization: k = μ/4, h = 4μ, plus
    * the mirrored downward test), through the SAME cusumFromCounts.
    */
  def cusumTwoSidedView(spark: SparkSession,
      outPath: String): DataFrame = {
    val counts = readPartsWithBatch(spark, outPath, -1L, CountSchema)
      .groupBy("event_type", "h").agg(sum(col("n0")).as("n0"))
    EventWindows.cusumFromCounts(counts, slackDiv = 4L, hMult = 4L,
      twoSided = true)
  }

  /** The seasonal hour-of-week answer — shaped exactly like
    * `w_seasonal_anomaly` (slot baselines are series-relative like
    * cusum's μ: a batch adding a new week retroactively re-evaluates
    * every slot's leave-one-out means, which is exactly the batch
    * answer on the union — the twin contract).
    */
  def seasonalView(spark: SparkSession, outPath: String): DataFrame = {
    val counts = readPartsWithBatch(spark, outPath, -1L, CountSchema)
      .groupBy("event_type", "h").agg(sum(col("n0")).as("n0"))
    EventWindows.seasonalFromCounts(counts)
  }
}
