package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

import graft.pipeline.EventWindows
import graft.streaming.IncrementalDedupStream.readParts

/** Streaming twin of `w_attribution` — conversion credit maintained as
  * events ARRIVE, exact under ANY batch split and arrival order: a LATE
  * touch landing inside an already-credited conversion's lookback
  * RETROACTIVELY re-credits it (its k grows, so every linear share
  * shrinks, and the last touch may change) — per-conversion-frozen
  * state could never recover that, so the state here is the EVENT
  * ROWS, not the credits (the FunnelStream discipline):
  *
  *  - per micro-batch, ONE idempotent `batch=<id>` overwrite partition
  *    holding just the attribution-relevant slice (touch and conversion
  *    rows, projected to micros/ids) — in a real firehose a small
  *    fraction of the stream;
  *  - the live view re-derives credits through the SAME
  *    [[EventWindows.attributionFromMicros]] the batch operator uses,
  *    so stream ≡ batch by construction;
  *  - growth is bounded by [[vacuum]]: conversions older than a
  *    caller-chosen horizon have FINAL credits once no touch can still
  *    arrive for them (horizon = watermark), so their per-channel
  *    aggregate — ADDITIVE across disjoint conversion sets — is folded
  *    into a finalized table and their rows (plus touches too old for
  *    any live conversion, tus ≤ horizon − lookback) are dropped. The
  *    view is then finalized + live, still exactly the batch answer
  *    for every event ever ingested.
  */
object AttributionStream {
  private val ConvSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("cus", LongType),
    StructField("cid", LongType)))
  private val TouchSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("tus", LongType),
    StructField("tid", LongType), StructField("event_type", StringType)))
  private val FinalSchema = StructType(Seq(
    StructField("event_type", StringType),
    StructField("n_touches", LongType),
    StructField("last_touch_conversions", LongType),
    StructField("linear_credit_micro", LongType),
    StructField("u_credit_micro", LongType)))

  /** One micro-batch: the relevant slices into this batch's partitions.
    * Public so the spec drives the identical body without a stream.
    */
  def ingestBatch(batch: DataFrame, batchId: Long, root: String,
      touchTypes: Seq[String], convType: String): Unit = {
    batch.filter(col("event_type") === convType)
      .select(col("user_id"), unix_micros(col("ts")).as("cus"),
        col("event_id").as("cid"))
      .write.mode("overwrite").parquet(s"$root/conv/batch=$batchId")
    batch.filter(col("event_type").isInCollection(touchTypes))
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_id").as("tid"), col("event_type"))
      .write.mode("overwrite").parquet(s"$root/touch/batch=$batchId")
  }

  private def liveConv(spark: SparkSession, root: String): DataFrame =
    readParts(spark, s"$root/conv", -1L, ConvSchema)
  private def liveTouch(spark: SparkSession, root: String): DataFrame =
    readParts(spark, s"$root/touch", -1L, TouchSchema)
  private def finalized(spark: SparkSession, root: String): DataFrame =
    readParts(spark, s"$root/final", -1L, FinalSchema)

  /** The cumulative per-channel credit frame — shaped exactly like the
    * batch `w_attribution`: finalized partitions plus the live
    * re-derivation, summed per channel.
    */
  def creditView(spark: SparkSession, root: String,
      lookbackUs: Long = 604800000000L): DataFrame =
    EventWindows.attributionFromMicros(liveConv(spark, root),
        liveTouch(spark, root), lookbackUs)
      .union(finalized(spark, root))
      .groupBy("event_type")
      .agg(sum(col("n_touches")).as("n_touches"),
        sum(col("last_touch_conversions")).as("last_touch_conversions"),
        sum(col("linear_credit_micro")).as("linear_credit_micro"),
        sum(col("u_credit_micro")).as("u_credit_micro"))

  /** Fold conversions with cus < `horizonUs` into the finalized table
    * and physically drop their rows, plus touches no live conversion
    * can reference (tus ≤ horizon − lookback). EXACT as long as no
    * event older than the horizon arrives afterwards — the horizon is
    * the caller's lateness watermark (the CrawlDiffStream vacuum
    * contract). Uses a fresh `final/batch=<id>` partition keyed by the
    * vacuum horizon so a re-run of the same vacuum is idempotent.
    */
  def vacuum(spark: SparkSession, root: String, horizonUs: Long,
      lookbackUs: Long = 604800000000L): Unit = {
    // FS derived from the ROOT path, not fs.defaultFS — a sink root on
    // a different scheme would make every exists/create fail Wrong-FS
    val fs0 = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // CRASH RECOVERY (must run before anything reads the live dirs): a
    // vacuum that died between its live-dir delete and the tmp rename
    // left the survivors ONLY in <name>.tmp — recomputing kept rows
    // from the now-empty live dir would overwrite that tmp with an
    // empty frame and permanently lose every live conversion/touch.
    // The recovery rule ([[CompactSwap]]) pairs with the write-once
    // finalize below: a complete tmp implies the finalize committed, so
    // installing it never loses credits; a partial tmp implies no
    // delete ran yet, so the live dir is intact and the tmp drops.
    CompactSwap.recoverSwap(fs0, root, "conv")
    CompactSwap.recoverSwap(fs0, root, "touch")
    val conv = liveConv(spark, root).persist()
    val touch = liveTouch(spark, root).persist()
    val finalPart =
      new org.apache.hadoop.fs.Path(s"$root/final/batch=$horizonUs")
    // WRITE-ONCE per horizon: a rerun of the same vacuum sees the rows
    // already dropped, so recomputing `old` would overwrite the
    // finalized credits with an empty slice. The existing partition IS
    // the durable result; rerun then only redoes the (idempotent)
    // drop/compact below. A reader between a crashed vacuum's finalize
    // and its rerun can double-count the finalized slice — the
    // documented non-atomic window of the compaction contract. (That
    // window is the ONLY exposure: events can never be LOST to a crash
    // — [[recoverSwap]] above installs a complete leftover compaction
    // instead of recomputing it from a half-swapped live dir.) The gate
    // checks COMPLETENESS (_SUCCESS), not dir existence: a crash
    // mid-finalize leaves a partial dir, and treating it as committed
    // would drop the pre-horizon rows with their credits lost forever;
    // overwrite mode replaces the partial dir on the rerun.
    if (!fs0.exists(
        new org.apache.hadoop.fs.Path(finalPart, "_SUCCESS"))) {
      val old = conv.filter(col("cus") < horizonUs)
      EventWindows.attributionFromMicros(old, touch, lookbackUs)
        .write.mode("overwrite").parquet(finalPart.toString)
      // sentinel planted explicitly — the gate must not depend on the
      // committer's marksuccessfuljobs config (CompactSwap.ensureSuccess)
      CompactSwap.ensureSuccess(fs0, finalPart)
    }
    val keptConv = conv.filter(col("cus") >= horizonUs)
    val keptTouch = touch.filter(col("tus") > horizonUs - lookbackUs)
    // rewrite the live tables as single compacted partitions; plant the
    // _SUCCESS recoverSwap's tmp-complete arbitration keys on
    keptConv.write.mode("overwrite").parquet(s"$root/conv.tmp")
    CompactSwap.ensureSuccess(fs0,
      new org.apache.hadoop.fs.Path(s"$root/conv.tmp"))
    keptTouch.write.mode("overwrite").parquet(s"$root/touch.tmp")
    CompactSwap.ensureSuccess(fs0,
      new org.apache.hadoop.fs.Path(s"$root/touch.tmp"))
    conv.unpersist(); touch.unpersist()
    CompactSwap.installTmp(fs0, root, "conv")
    CompactSwap.installTmp(fs0, root, "touch")
  }

  /** Start the ingest on a streaming events frame. */
  def start(events: DataFrame, root: String, checkpoint: String,
      touchTypes: Seq[String], convType: String): StreamingQuery = {
    val body: (DataFrame, Long) => Unit =
      (b, id) => ingestBatch(b, id, root, touchTypes, convType)
    events.writeStream
      .foreachBatch(body)
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
