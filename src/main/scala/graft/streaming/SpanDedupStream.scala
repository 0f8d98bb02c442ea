package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Streaming exact-substring (span) dedup against a persisted SPAN-HASH
  * index — the incremental twin of `Dedup.stripDupSpans`, with
  * arrival-order semantics: the FIRST occurrence of a span keeps its
  * text; any later doc repeating it (from a previous batch, or from a
  * smaller set of same-batch peers) has the covered token positions
  * stripped. This is the shape a streaming ingest actually wants —
  * the already-emitted first occurrence cannot be retro-stripped.
  *
  * Per micro-batch cost: spanning is O(batch) — index text is never
  * re-read (the index is just DISTINCT 64-bit span hashes, 8 bytes a
  * row, bucketable on `g`); the membership probe broadcasts the batch's
  * span set; the coverage explode is bounded to duplicated positions.
  *
  * Exactly-once effect under at-least-once `foreachBatch`: all writes
  * land in `batch=<id>` partitions with overwrite semantics and index
  * reads exclude the batch being (re)written, so a replayed batch
  * recomputes the same deterministic output and overwrites itself —
  * same discipline as [[IncrementalDedupStream]].
  */
object SpanDedupStream {
  private val SpanSchema = StructType(Seq(StructField("g", LongType)))

  /** One micro-batch: emit (doc_id, text_stripped) for every batch doc
    * (verbatim when nothing matched, empty string when fully covered —
    * a verbatim re-paste of indexed text), append the batch's distinct
    * span hashes to the index. Public so the spec can drive the exact
    * body without a stream.
    */
  def ingestBatch(batch: DataFrame, batchId: Long, indexPath: String,
      outPath: String, n: Int): Unit = {
    val spark = batch.sparkSession
    val b = batch.select("doc_id", "text").persist()
    val withToks = b.select(col("doc_id"), split(col("text"), " ").as("t"))
    val grams = withToks
      .filter(size(col("t")) >= n)
      .select(col("doc_id"),
        explode(sequence(lit(0), size(col("t")) - n)).as("pos"), col("t"))
      .select(col("doc_id"), col("pos"),
        xxhash64((0 until n).map(j =>
          element_at(col("t"), col("pos") + j + 1)): _*).as("g"))
      .persist()

    val iSpans = IncrementalDedupStream.readParts(
      spark, s"$indexPath/spans", batchId, SpanSchema)
    // index spans present in this batch (the only ones that can strip
    // anything); the batch span set is small → broadcast probe
    val hits = iSpans
      .join(broadcast(grams.select("g").distinct()), Seq("g"))
      .select("g").distinct()
    // same-batch cross-doc duplicated spans (within-doc repetition does
    // not strip, matching the batch operator)
    val intra = grams.select("doc_id", "g").distinct()
      .groupBy("g").agg(count(lit(1)).as("dc"))
      .filter(col("dc") >= 2).select("g")
    val dupG = hits.union(intra).distinct()

    val covered = grams.join(dupG, Seq("g"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("p"))
      .distinct()
    val toks = withToks
      .select(col("doc_id"), posexplode(col("t")).as(Seq("p", "tok")))
    val stripped = toks.join(covered, Seq("doc_id", "p"), "left_anti")
      .groupBy("doc_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("p"), col("tok")))),
          x => x.getField("tok")), " ").as("text_stripped"))
    // every batch doc gets an output row — a fully-covered doc (all
    // tokens stripped) yields the empty string rather than vanishing,
    // because a streaming consumer needs the per-doc verdict
    b.select("doc_id")
      .join(stripped, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("text_stripped"), lit("")).as("text_stripped"))
      .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
    // index the ORIGINAL batch spans (stripped docs included): any span
    // this batch exhibited must strip future repeats
    grams.select("g").distinct()
      .write.mode("overwrite").parquet(s"$indexPath/spans/batch=$batchId")

    grams.unpersist()
    b.unpersist()
  }

  /** Start the ingest on a streaming `docs` frame (doc_id, text). */
  def start(docs: DataFrame, indexPath: String, outPath: String, n: Int,
      checkpoint: String): StreamingQuery = {
    val body: (DataFrame, Long) => Unit =
      (b, id) => ingestBatch(b, id, indexPath, outPath, n)
    docs.writeStream
      .foreachBatch(body)
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
