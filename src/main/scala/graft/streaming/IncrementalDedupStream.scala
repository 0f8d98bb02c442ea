package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming near-dup ingest: each micro-batch joins the PERSISTED
  * survivor index through `Dedup.incrementalJaccardPairs`, drops batch
  * docs that near-duplicate the index (or a smaller-id doc in the same
  * batch), appends the survivors to the index and the flagged ids to a
  * side output.
  *
  * This is the compaction-shaped half of streaming dedup that
  * `WindowedStreams.qualityGate` explicitly leaves batch-side: per-record
  * state (exact fingerprints within a watermark) lives in the stream;
  * corpus-wide candidate joins run per micro-batch against the index,
  * whose cost is O(batch·df) by the incremental enumeration — the index
  * is never self-joined. At 100 TB the index is a partitioned table and
  * the same `foreachBatch` body runs unchanged.
  *
  * Drop rule (deterministic, standard keeper-selection): a batch doc is
  * flagged if it pairs with any index doc, or with any SMALLER-id doc of
  * its own batch (whether or not that doc is itself flagged).
  *
  * Exactly-once effect under at-least-once `foreachBatch`: every write
  * lands in a `batch=<id>` partition directory with OVERWRITE semantics,
  * and the index read excludes the batch being (re)written — so a
  * replayed micro-batch recomputes against the same prior-batch index
  * and overwrites its own previous output instead of appending
  * duplicates. The decision itself is deterministic, so the rewrite is
  * byte-identical.
  */
object IncrementalDedupStream {
  private val IndexSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  /** Survivor index = every `batch=<id>` partition EXCEPT the one being
    * (re)written, so a replayed batch sees the same input state.
    */
  private def readIndex(spark: SparkSession, path: String,
      excludeBatch: Long): DataFrame = {
    val root = new java.io.File(path)
    val parts = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .filterNot(_.getName == s"batch=$excludeBatch")
      .map(_.getAbsolutePath)
    if (parts.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], IndexSchema)
    else spark.read.parquet(parts: _*).select("doc_id", "text")
  }

  /** One micro-batch: flag, persist survivors. Public so the batch tier
    * (and the spec) can drive the identical body without a stream.
    */
  def ingestBatch(batch: DataFrame, batchId: Long, indexPath: String,
      flaggedPath: String, threshold: Double, maxDf: Int): Unit = {
    val spark = batch.sparkSession
    val b = batch.select("doc_id", "text").persist()
    val pairs = graft.pipeline.Dedup
      .incrementalJaccardPairs(readIndex(spark, indexPath, batchId), b,
        threshold, maxDf)
      .select("da", "db")
    val daNew = b.select(col("doc_id").as("da"), lit(true).as("da_new"))
    val dbNew = b.select(col("doc_id").as("db"), lit(true).as("db_new"))
    val drops = pairs
      .join(daNew, Seq("da"), "left").join(dbNew, Seq("db"), "left")
      .select(
        when(coalesce(col("da_new"), lit(false)) &&
          coalesce(col("db_new"), lit(false)),
          greatest(col("da"), col("db")))
          .when(coalesce(col("da_new"), lit(false)), col("da"))
          .otherwise(col("db")).as("doc_id"))
      .distinct()
      .persist()
    drops.write.mode("overwrite")
      .parquet(s"$flaggedPath/batch=$batchId")
    b.join(drops, Seq("doc_id"), "left_anti")
      .write.mode("overwrite")
      .parquet(s"$indexPath/batch=$batchId")
    drops.unpersist()
    b.unpersist()
  }

  /** Start the ingest on a streaming `docs` frame (doc_id, text). */
  def start(docs: DataFrame, indexPath: String, flaggedPath: String,
      threshold: Double, maxDf: Int, checkpoint: String): StreamingQuery = {
    val body: (DataFrame, Long) => Unit =
      (b, id) => ingestBatch(b, id, indexPath, flaggedPath, threshold, maxDf)
    docs.writeStream
      .foreachBatch(body)
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
