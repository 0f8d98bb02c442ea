package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

import graft.pipeline.Calibration
import graft.streaming.IncrementalDedupStream.readParts

/** Streaming twin of `a_auc` — the scorer's ranking quality maintained
  * as documents ARRIVE, giving the ingest pipeline the same "is the
  * quality scorer still discriminating?" observability the batch
  * [[Calibration.rankAuc]] gives a finished corpus (the
  * [[MixReportStream]] sufficient-statistic discipline applied to the
  * eval family's last batch-only member).
  *
  * The state is the MINIMAL sufficient statistic for midrank AUC: one
  * (source, s_micro) → (n_pos, n_tot) count row per distinct score per
  * micro-batch. Counts are ADDITIVE across batches, and the
  * Mann–Whitney statistic with midrank ties is a pure function of the
  * merged per-score counts: a tied group occupying ranks a..b has
  * 2·midrank = a + b = 2·cum_before + n_g + 1 (every member shares it,
  * positive or not), so
  *
  *   sp2 = Σ_g n_pos(g) · (2·cum_before(g) + n_g + 1)
  *
  * — exactly the batch operator's Σ over positives of
  * (min(rn) + max(rn)), doc_id tie-order free. That is what makes
  * stream ≡ batch EXACT rather than approximate
  * (CalibrationStreamSpec pins `auc_micro` equality across batch
  * splits); it is also why the RELIABILITY table has no counts-only
  * twin: ntile(10) splits tied score groups by doc_id order, so its
  * bucket memberships need the doc-level frame, not a statistic of it
  * — a stream wanting deciles keeps per-doc rows (the FunnelStream
  * event-rows pattern) and pays state linear in docs, which is
  * precisely what this operator exists to avoid.
  *
  * Exactly-once under at-least-once foreachBatch: each batch's counts
  * land in a `batch=<id>` overwrite partition (the family's idempotent
  * replay discipline — a redelivered batch overwrites its own
  * partition rather than double-counting).
  *
  * Steady-state cost per micro-batch: one codegen'd scoring pass +
  * one map-side-combined (source, s_micro) aggregate over the batch.
  * The view's window runs over the merged DISTINCT-SCORE table —
  * bounded by the score grid per source, never by corpus size — and
  * every division is integer, after the final sums.
  */
object CalibrationStream {
  private val CntSchema = StructType(Seq(
    StructField("source", StringType), StructField("s_micro", LongType),
    StructField("n_pos", LongType), StructField("n_tot", LongType)))

  /** One micro-batch: per-(source, score) pos/total counts into this
    * batch's partition. Public so the spec drives the identical body
    * without a stream (the family convention).
    */
  def ingestBatch(batch: DataFrame, batchId: Long, root: String): Unit =
    Calibration.scoredDocs(batch)
      .groupBy("source", "s_micro")
      .agg(sum(when(col("truth"), 1L).otherwise(0L)).as("n_pos"),
        count(lit(1)).as("n_tot"))
      .write.mode("overwrite").parquet(s"$root/cnt/batch=$batchId")

  /** The cumulative per-source AUC frame — shaped exactly like the
    * batch `a_auc`: (source, n_pos, n_neg, auc_micro), NULL when a
    * source has no positives or no negatives.
    */
  def auc(spark: SparkSession, root: String): DataFrame = {
    val merged = readParts(spark, s"$root/cnt", -1L, CntSchema)
      .groupBy("source", "s_micro")
      .agg(sum(col("n_pos")).as("n_pos"), sum(col("n_tot")).as("n_tot"))
    val w = Window.partitionBy("source").orderBy("s_micro")
      .rowsBetween(Window.unboundedPreceding, -1)
    merged
      .withColumn("r2",
        lit(2L) * coalesce(sum(col("n_tot")).over(w), lit(0L)) +
          col("n_tot") + lit(1L))
      .groupBy("source")
      .agg(sum(col("n_pos")).as("n_pos"),
        sum(col("n_tot") - col("n_pos")).as("n_neg"),
        sum(col("n_pos") * col("r2")).as("sp2"))
      .select(col("source"), col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          expr("(sp2 - n_pos * (n_pos + 1)) * 1000000 " +
            "DIV (2 * n_pos * n_neg)"))
          .otherwise(lit(null).cast("long")).as("auc_micro"))
  }

  /** Start the audit on a streaming `docs` frame
    * (doc_id, source, text).
    */
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
