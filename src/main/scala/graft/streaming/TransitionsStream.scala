package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

import graft.pipeline.EventWindows
import graft.streaming.IncrementalDedupStream.readParts

/** Streaming twin of `w_transitions` — first-order event-transition
  * counts maintained as events ARRIVE, exact under ANY batch split and
  * arrival order. The retroactive case is an INSERTION: a late event
  * landing BETWEEN two already-paired events SPLITS their transition —
  * (a → c) must disappear and (a → b), (b → c) appear — which
  * per-transition counter state could never replay, so the live state
  * is the event rows themselves (the [[FunnelStream]] /
  * [[AttributionStream]] discipline), projected to
  * (user_id, us, event_id, event_type):
  *
  *  - per micro-batch, ONE idempotent `batch=<id>` overwrite partition
  *    of the projected rows;
  *  - the live view re-derives counts through the SAME
  *    [[EventWindows.transitionsFromMicros]] fold the batch operator
  *    uses, so stream ≡ batch by construction;
  *  - growth is bounded by [[vacuum]]: once no event older than a
  *    horizon can arrive (horizon = the caller's lateness watermark),
  *    every transition BOTH of whose endpoints predate the horizon is
  *    final — a late event can no longer split it — so those counts
  *    fold into a write-once `final/batch=<horizon>` partition and the
  *    pre-horizon rows drop, EXCEPT each user's single latest
  *    pre-horizon event, which is kept to form the one CROSSING
  *    transition (last-pre → first-post) live. The view is then
  *    finalized + live, still exactly the batch answer on every event
  *    ever ingested. The swap is crash-recoverable via [[CompactSwap]].
  *
  * Steady-state cost per micro-batch: one projection write. The view's
  * window partitions per user over live (post-horizon + one boundary
  * row per user) state; the finalized table is #types²-sized.
  */
object TransitionsStream {
  private val EvSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("us", LongType),
    StructField("event_id", LongType),
    StructField("event_type", StringType)))
  private val FinalSchema = StructType(Seq(
    StructField("event_type", StringType),
    StructField("next_type", StringType), StructField("n", LongType)))

  /** One micro-batch: the projected event rows into this batch's
    * partition. Public so the spec drives the identical body without a
    * stream (the family convention).
    */
  def ingestBatch(batch: DataFrame, batchId: Long, root: String): Unit =
    batch.select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .write.mode("overwrite").parquet(s"$root/ev/batch=$batchId")

  private def liveEv(spark: SparkSession, root: String): DataFrame =
    readParts(spark, s"$root/ev", -1L, EvSchema)
  private def finalized(spark: SparkSession, root: String): DataFrame =
    readParts(spark, s"$root/final", -1L, FinalSchema)

  /** The cumulative transition-count frame — shaped exactly like the
    * batch `w_transitions`: (event_type, next_type, n).
    */
  def counts(spark: SparkSession, root: String): DataFrame =
    EventWindows.transitionsFromMicros(liveEv(spark, root))
      .union(finalized(spark, root))
      .groupBy("event_type", "next_type")
      .agg(sum(col("n")).as("n"))

  /** Fold transitions fully inside the horizon into the finalized
    * table and drop pre-horizon rows, keeping each user's latest
    * pre-horizon event for the live crossing transition. EXACT as long
    * as no event older than the horizon arrives afterwards — the
    * horizon is the caller's lateness watermark (the
    * [[AttributionStream.vacuum]] contract). Write-once finalize keyed
    * by the horizon makes a rerun idempotent; [[CompactSwap]] makes
    * the swap crash-recoverable.
    */
  def vacuum(spark: SparkSession, root: String, horizonUs: Long): Unit = {
    // FS derived from the ROOT path, not fs.defaultFS — a sink root on
    // a different scheme would make every exists/create fail Wrong-FS
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    CompactSwap.recoverSwap(fs, root, "ev")
    val ev = liveEv(spark, root).persist()
    val pre = ev.filter(col("us") < horizonUs)
    val finalPart =
      new org.apache.hadoop.fs.Path(s"$root/final/batch=$horizonUs")
    // transitions among pre-horizon events only — the lead() over the
    // pre slice pairs within it, so the crossing pair (whose second
    // endpoint is post-horizon) is NOT finalized; it stays live via
    // the kept boundary row below.
    // Write-once gates on COMPLETENESS (_SUCCESS), not dir existence: a
    // crash mid-finalize leaves the dir present but partial, and
    // skipping the rerun's finalize would then compact away the
    // pre-horizon rows with the finalized counts lost forever (the
    // "never LOST to a crash" contract). Overwrite mode replaces a
    // partial dir; a complete finalize still short-circuits.
    if (!fs.exists(
        new org.apache.hadoop.fs.Path(finalPart, "_SUCCESS"))) {
      EventWindows.transitionsFromMicros(pre)
        .write.mode("overwrite").parquet(finalPart.toString)
      // sentinel planted explicitly — the gate must not depend on the
      // committer's marksuccessfuljobs config (CompactSwap.ensureSuccess)
      CompactSwap.ensureSuccess(fs, finalPart)
    }
    val boundary = pre
      .groupBy("user_id")
      .agg(max_by(struct(col("us"), col("event_id"), col("event_type")),
        struct(col("us"), col("event_id"))).as("x"))
      .select(col("user_id"), col("x.us").as("us"),
        col("x.event_id").as("event_id"),
        col("x.event_type").as("event_type"))
    ev.filter(col("us") >= horizonUs).union(boundary)
      .write.mode("overwrite").parquet(s"$root/ev.tmp")
    // recoverSwap judges tmp completeness by _SUCCESS too — plant it
    CompactSwap.ensureSuccess(fs,
      new org.apache.hadoop.fs.Path(s"$root/ev.tmp"))
    ev.unpersist()
    CompactSwap.installTmp(fs, root, "ev")
  }

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
