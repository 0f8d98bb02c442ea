package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.pipeline.Dedup
import graft.streaming.IncrementalDedupStream.{readParts, readPartsWithBatch}

/** Streaming twin of `t_ngram_novelty` — first-occurrence n-gram novelty
  * maintained incrementally over an ingest stream: per micro-batch, each
  * arriving doc's distinct trigrams are checked against a PERSISTED
  * first-occurrence index, the doc's novelty fraction is emitted, and —
  * because first occurrence is attributed by doc_id (crawl order), not
  * arrival order — a late-arriving SMALLER doc_id that first-introduces
  * a gram retroactively RE-EMITS the previous holder with its corrected
  * (lower) novelty. The latest-emission view therefore equals the batch
  * operator on the union of all batches under ANY split — the
  * BoilerplateStream correction discipline applied to the novelty
  * measurement.
  *
  * Steady-state cost per micro-batch: shingling is O(batch); the index
  * gram table is only ever read joined against the batch's gram set
  * (broadcast prune) except for the loser re-read, which touches just
  * the docs that actually lost a first occurrence — in id-ordered
  * ingest (the normal crawl shape) that set is empty and the whole
  * correction path is a no-op. Exactly-once under at-least-once
  * foreachBatch: `batch=<id>` overwrite partitions, index reads exclude
  * the batch being (re)written (the IncrementalDedupStream discipline).
  *
  * Gram identity is the 64-bit shingle hash ([[Dedup.shingleHashes]]) —
  * the batch operator's string grams modulo the engine-wide
  * no-collision assumption its oracles already prove.
  */
object NoveltyStream {
  private val GramSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("g", LongType)))
  private val OutSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("n_grams", LongType),
    StructField("n_novel", LongType),
    StructField("novelty_micro", LongType)))

  private def docGrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(Dedup.shingleHashes(col("text"))).as("g"))

  /** One micro-batch. Public so the spec can drive the identical body
    * without a stream (the family convention).
    */
  def ingestBatch(batch: DataFrame, batchId: Long, indexPath: String,
      outPath: String): Unit = {
    val spark = batch.sparkSession
    val bg = docGrams(batch.select("doc_id", "text")).persist()
    bg.write.mode("overwrite").parquet(s"$indexPath/grams/batch=$batchId")

    val allIndex = readParts(spark, s"$indexPath/grams", batchId,
      GramSchema)
    // index rows sharing a gram with this batch — everything the
    // min-change detection needs; the batch gram set broadcasts
    val iRel = allIndex
      .join(broadcast(bg.select("g").distinct()), Seq("g")).persist()

    // previous vs new first-occurrence holder per batch-present gram
    val oldMin = iRel.groupBy("g").agg(min("doc_id").as("om"))
    val newMin = iRel.select("g", "doc_id")
      .union(bg.select("g", "doc_id"))
      .groupBy("g").agg(min("doc_id").as("nm"))
    // index docs that LOSE a first occurrence to a smaller arriving id
    // (index mins only ever decrease, so nobody ever gains later)
    val losers = newMin.join(oldMin, Seq("g"))
      .filter(col("nm") < col("om"))
      .select(col("om").as("doc_id")).distinct().persist()

    // affected docs = the batch + the losers; recompute their counts
    // against the CURRENT corpus-wide minimum of their grams
    val loserGrams = allIndex.join(broadcast(losers), Seq("doc_id"))
    val affGrams = bg.unionByName(loserGrams).persist()
    val gmin = allIndex.select("g", "doc_id")
      .union(bg.select("g", "doc_id"))
      .join(broadcast(affGrams.select("g").distinct()), Seq("g"))
      .groupBy("g").agg(min("doc_id").as("m"))
    affGrams.join(gmin, Seq("g"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_grams"),
        sum(when(col("m") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty_micro", expr("(1000000 * n_novel) DIV n_grams"))
      .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")

    Seq(affGrams, losers, iRel, bg).foreach(_.unpersist())
  }

  /** The stream's current answer: each doc's emission from the largest
    * batch — after the final batch, the batch operator's numbers.
    */
  def latestOutput(spark: SparkSession, outPath: String): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy(col("batch").desc)
    readPartsWithBatch(spark, outPath, -1L, OutSchema)
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select("doc_id", "n_grams", "n_novel", "novelty_micro")
  }
}
