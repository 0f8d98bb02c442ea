package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

import graft.pipeline.TextAnalysis
import graft.streaming.IncrementalDedupStream.readParts

/** Streaming twin of `t_cms_portable` — the heavy-hitter frequency
  * audit maintained as documents ARRIVE, and the live demonstration of
  * the property the portable sketch exists for: a Count-Min sketch is
  * LINEAR in its input counts, so merging the per-batch sketches is a
  * plain (j, b)-wise union+sum — the same merge that combines sketches
  * across engines, executors, or days of a 100 TB crawl without ever
  * touching the token stream again.
  *
  * Per micro-batch the state is two idempotent `batch=<id>` overwrite
  * partitions: the batch's (w, c) word counts (vocabulary-bounded —
  * needed because the report probes the EXACT top-20, which no sketch
  * can recover) and the batch's own (j, b, cc) sketch built by the
  * SAME [[TextAnalysis.cmsSketchFrom]] the batch query uses. The
  * cumulative view sums both tables and feeds them through the same
  * [[TextAnalysis.cmsReport]] — so stream ≡ batch is exactly two
  * algebraic facts (word counts are additive; the sketch is linear)
  * plus shared code, and CmsStreamSpec pins both: the 3-batch view
  * equals the batch frame, and the summed batch sketches equal the
  * rebuilt-from-scratch sketch row for row.
  *
  * Steady-state cost per micro-batch: one batch-sized token aggregate
  * plus 4 md5s per distinct batch word. The view reads counts only.
  */
object CmsStream {
  private val WcSchema = StructType(Seq(
    StructField("w", StringType), StructField("c", LongType)))
  private val SkSchema = StructType(Seq(
    StructField("j", LongType), StructField("b", LongType),
    StructField("cc", LongType)))

  /** One micro-batch: word counts + the batch's own sketch into this
    * batch's partitions. Public so the spec drives the identical body
    * without a stream (the family convention).
    */
  def ingestBatch(batch: DataFrame, batchId: Long, root: String): Unit = {
    val wc = batch
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .persist()
    wc.write.mode("overwrite").parquet(s"$root/wc/batch=$batchId")
    TextAnalysis.cmsSketchFrom(wc)
      .select(col("j").cast("long").as("j"), col("b"), col("cc"))
      .write.mode("overwrite").parquet(s"$root/sketch/batch=$batchId")
    wc.unpersist()
  }

  /** Cumulative merged word counts — additive across batches. */
  def mergedCounts(spark: SparkSession, root: String): DataFrame =
    readParts(spark, s"$root/wc", -1L, WcSchema)
      .groupBy("w").agg(sum(col("c")).as("c"))

  /** Cumulative merged sketch — the union+sum CMS merge. */
  def mergedSketch(spark: SparkSession, root: String): DataFrame =
    readParts(spark, s"$root/sketch", -1L, SkSchema)
      .groupBy("j", "b").agg(sum(col("cc")).as("cc"))

  /** The cumulative exact-vs-estimate frame — shaped exactly like the
    * batch `t_cms_portable`: (w, exact, est), top-20 by exact count.
    */
  def report(spark: SparkSession, root: String): DataFrame =
    TextAnalysis.cmsReport(mergedCounts(spark, root),
      mergedSketch(spark, root))

  /** Start the audit on a streaming `docs` frame (text). */
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
