package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

import graft.operators.QuantileSketch
import graft.streaming.IncrementalDedupStream.readParts

/** Streaming twin of `r_quantile_portable` — running latency/price
  * percentiles maintained as rows ARRIVE, riding the same algebraic
  * fact as [[CmsStream]]: the fixed-grid quantile sketch is LINEAR in
  * its bin counts, so the cumulative view merges per-batch sketches
  * with a plain (key, bin)-wise union+sum — the identical merge that
  * combines sketches across executors or days at 100 TB.
  *
  * Per micro-batch the state is ONE idempotent `batch=<id>` overwrite
  * partition holding the batch's own (k, bin, n) sketch, built by the
  * SAME [[QuantileSketch.sketch]] the batch operator uses; the
  * cumulative view feeds the summed bins through the SAME
  * [[QuantileSketch.quantiles]] — stream ≡ batch is bin-count
  * additivity plus shared code, and QuantileStreamSpec pins the
  * 3-batch view against the batch frame, replay idempotence, and the
  * foreachBatch wiring.
  *
  * Steady-state cost per micro-batch: one batch-sized (key, bin)
  * aggregate. The view reads occupied-bin rows only — bounded by
  * value-range/bin-width per key, never by stream length.
  */
object QuantileStream {
  private val SkSchema = StructType(Seq(
    StructField("k", StringType), StructField("bin", LongType),
    StructField("n", LongType)))

  /** One micro-batch: the batch's own sketch into its partition.
    * Public so the spec drives the identical body without a stream
    * (the family convention). `batch` must carry (k, v).
    */
  def ingestBatch(batch: DataFrame, batchId: Long, root: String,
      binCents: Long): Unit =
    QuantileSketch.sketch(batch, col("k"), col("v"), binCents)
      .write.mode("overwrite").parquet(s"$root/sketch/batch=$batchId")

  /** Cumulative merged sketch — the union+sum merge. */
  def mergedSketch(spark: SparkSession, root: String): DataFrame =
    readParts(spark, s"$root/sketch", -1L, SkSchema)
      .groupBy("k", "bin").agg(sum(col("n")).as("n"))

  /** The cumulative quantile frame — shaped exactly like the batch
    * operator's read over the same percents.
    */
  def quantileView(spark: SparkSession, root: String, binCents: Long,
      qPcts: Seq[Int]): DataFrame =
    QuantileSketch.quantiles(mergedSketch(spark, root), binCents, qPcts)

  /** Start the sketch ingest on a streaming (k, v) frame. */
  def start(rows: DataFrame, root: String, checkpoint: String,
      binCents: Long): StreamingQuery = {
    val body: (DataFrame, Long) => Unit =
      (b, id) => ingestBatch(b, id, root, binCents)
    rows.writeStream
      .foreachBatch(body)
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
