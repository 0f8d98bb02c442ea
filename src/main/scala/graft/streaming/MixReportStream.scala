package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

import graft.pipeline.{TextAnalysis, TrainingSet}
import graft.streaming.IncrementalDedupStream.readParts

/** Streaming twin of `a_mix_report` — the mix-deviation audit
  * maintained as documents ARRIVE, giving the ingest pipeline the same
  * "is the crawl drifting off its configured source mix?" observability
  * the batch report gives a finished corpus (the `CascadeReportStream`
  * precedent applied to the mixture audit).
  *
  * The state is the MINIMAL sufficient statistic: one (source, tokens)
  * row per source per micro-batch — token counts are ADDITIVE across
  * batches, so the cumulative achieved mix is one sum over a
  * batches×sources-sized table, and every division (the 1e-6 DIV grid)
  * happens only in the view, after the final sum. That is what makes
  * stream ≡ batch EXACT rather than approximate: [[report]] feeds the
  * summed counts through the very same
  * [[TrainingSet.mixReportFromAch]] the batch operator uses, so the
  * two can only differ if the token sums differ (MixStreamSpec pins
  * equality across batch splits, including the unmatched-target and
  * leaked-source outer-join rows).
  *
  * Exactly-once under at-least-once foreachBatch: each batch's counts
  * land in a `batch=<id>` overwrite partition (the family's idempotent
  * replay discipline — a redelivered batch overwrites its own
  * partition rather than double-counting).
  *
  * Steady-state cost per micro-batch: one map-side-combined per-source
  * token aggregate over the batch — O(batch) work, sources-sized
  * output. The report view reads counts only; document text is never
  * retained.
  */
object MixReportStream {
  private val TokSchema = StructType(Seq(
    StructField("source", StringType), StructField("tokens", LongType)))

  /** One micro-batch: per-source token counts into this batch's
    * partition. Public so the spec drives the identical body without a
    * stream (the family convention).
    */
  def ingestBatch(batch: DataFrame, batchId: Long, root: String): Unit =
    batch
      .groupBy("source")
      .agg(coalesce(
        sum(TextAnalysis.tokenCount(col("text")).cast("long")),
        lit(0L)).as("tokens"))
      .write.mode("overwrite").parquet(s"$root/srctok/batch=$batchId")

  /** The cumulative mix-deviation frame — shaped exactly like the
    * batch `a_mix_report`: (source, tokens, achieved_micro,
    * target_micro, dev_micro), one row per source seen OR configured.
    */
  def report(spark: SparkSession, root: String,
      targets: Seq[(String, Long)]): DataFrame = {
    val ach = readParts(spark, s"$root/srctok", -1L, TokSchema)
      .groupBy("source").agg(sum(col("tokens")).as("tokens"))
    TrainingSet.mixReportFromAch(ach, targets)
  }

  /** Start the audit on a streaming `docs` frame (source, text). */
  def start(docs: DataFrame, root: String,
      checkpoint: String): StreamingQuery = {
    val body: (DataFrame, Long) => Unit =
      (b, id) => ingestBatch(b, id, root)
    docs.writeStream
      .foreachBatch(body)
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
