package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType,
  StructField, StructType}

import graft.streaming.IncrementalDedupStream.readPartsWithBatch

/** Streaming twin of `p_scd2_history` — SCD2 content history maintained
  * incrementally as crawl versions ARRIVE (version streams are ordered
  * by nature, so unlike [[NoveltyStream]] no retroactive correction
  * path exists to need): each arriving snapshot version compares every
  * doc's content hash against the doc's CURRENT run and either extends
  * that run's `valid_to` or opens a new run at this version. A doc
  * absent from a version simply isn't touched — its run stops
  * extending, which is exactly the batch operator's deletion
  * semantics, and a doc returning LATER with unchanged content extends
  * its old run across the gap, which is also the batch operator's
  * lag-over-present-versions semantics.
  *
  * State = the history table itself: one row per (doc, run), rewritten
  * per batch ONLY for arriving docs (per-version work ∝ snapshot size,
  * never history size — the SCD2 "merge into current" shape every
  * lakehouse implements). Emissions land in `batch=<version>`
  * overwrite partitions; the view takes the LATEST emission per
  * (doc, valid_from), so replays are idempotent and history reads
  * exclude the version being (re)written.
  */
object Scd2Stream {
  private val RunSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("content_md5", StringType),
    StructField("valid_from", IntegerType),
    StructField("valid_to", IntegerType)))

  /** Latest emission per (doc, run-start) from every batch before
    * `exclude` — the live history table.
    */
  private def runs(spark: SparkSession, outPath: String,
      exclude: Long): DataFrame = {
    val w = Window.partitionBy("doc_id", "valid_from")
      .orderBy(col("batch").desc)
    readPartsWithBatch(spark, outPath, exclude, RunSchema)
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select("doc_id", "content_md5", "valid_from", "valid_to")
  }

  /** Ingest one snapshot version (must arrive in increasing version
    * order — the nature of a crawl feed). Public so the spec drives the
    * identical body without a stream (the family convention).
    */
  def ingestVersion(snapshot: DataFrame, version: Int,
      outPath: String): Unit = {
    val spark = snapshot.sparkSession
    val snap = snapshot.select(col("doc_id"),
      md5(col("text")).as("h")).persist()
    // each arriving doc's CURRENT run (largest valid_from)
    val cw = Window.partitionBy("doc_id").orderBy(col("valid_from").desc)
    val current = runs(spark, outPath, version.toLong)
      .join(broadcast(snap.select("doc_id")), Seq("doc_id"))
      .withColumn("rk", row_number().over(cw)).filter(col("rk") === 1)
      .select(col("doc_id"), col("content_md5"), col("valid_from"))
    snap.join(current, Seq("doc_id"), "left")
      .select(col("doc_id"), col("h").as("content_md5"),
        // unchanged content extends the current run; changed or brand-new
        // content opens a run at this version
        when(col("content_md5") === col("h"), col("valid_from"))
          .otherwise(lit(version)).as("valid_from"),
        lit(version).as("valid_to"))
      .write.mode("overwrite").parquet(s"$outPath/batch=$version")
    snap.unpersist()
  }

  /** The stream's current answer, shaped like the batch operator:
    * history rows plus the current flag against the latest version.
    */
  def history(spark: SparkSession, outPath: String,
      latestVersion: Int): DataFrame =
    runs(spark, outPath, -1L)
      .withColumn("is_current", col("valid_to") === latestVersion)
      .select("doc_id", "content_md5", "valid_from", "valid_to",
        "is_current")
}
