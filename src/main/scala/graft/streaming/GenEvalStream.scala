package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

import graft.pipeline.BleuEval
import graft.streaming.IncrementalDedupStream.readParts

/** Streaming twin of the generation-eval sufficient statistics — corpus
  * BLEU, chrF, and ROUGE-L maintained as documents ARRIVE (the
  * [[CalibrationStream]] discipline applied to
  * `a_bleu`/`a_chrf`/`a_rouge_l`; the trio completed round 14). This
  * is the payoff of the eval operators' exact-integer SUMS design:
  * corpus BLEU/chrF are pure functions of Σ matches / Σ totals /
  * Σ lengths, every pair is (doc, its own deterministic corruption) —
  * pair-LOCAL to whichever micro-batch carries the doc — so per-batch
  * sums PARTITION the corpus sums and stream ≡ batch is EXACT under any
  * split (GenEvalStreamSpec pins 3-way-split equality row-for-row).
  *
  * State per batch: ≤ 12 rows (bleu n=1..4, chrf n=1..6, one bleu
  * length row, one rouge LCS row) in a `batch=<id>` overwrite
  * partition — the family's
  * idempotent replay discipline: a redelivered batch overwrites its own
  * partition rather than double-counting. The corpus view merges with
  * one (metric, n) aggregate over an O(batches)-row table; the float
  * geometric mean / β-mix stays caller-side, past the exact-integer
  * boundary, exactly like the batch operators.
  *
  * Row encoding: metric='bleu' rows carry (matches, cand_total=Σ n-gram
  * total, ref_total=0 — BLEU is precision-only); metric='chrf' rows
  * carry both denominators; the single metric='bleu_len' n=0 row
  * carries (0, Σ cand_len, Σ ref_len) — the brevity-penalty inputs,
  * summed ONCE per pair (not once per n). In the corpus view its
  * p_micro is the corpus length ratio. The metric='rouge' n=0 row
  * carries (Σ lcs, Σ cand_len, Σ ref_len): corpus micro
  * precision/recall are ratio-of-sums, the float F-measure stays
  * caller-side like BLEU's geometric mean.
  *
  * The stats builders' seam persists are released per micro-batch via
  * their `retain` handles — a long-lived stream holds ZERO executor
  * cache between batches (spec-pinned via cacheManager.isEmpty).
  */
object GenEvalStream {
  private val StatSchema = StructType(Seq(
    StructField("metric", StringType), StructField("n", LongType),
    StructField("matches", LongType), StructField("cand_total", LongType),
    StructField("ref_total", LongType)))

  /** One micro-batch of (doc_id, text) docs → the ≤11 sufficient-stat
    * rows into this batch's partition. Public so the spec drives the
    * identical body without a stream (the family convention).
    */
  def ingestBatch(docs: DataFrame, batchId: Long, root: String): Unit = {
    val caches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    try {
      // b feeds BOTH the per-n aggregation and the `lens` row inside one
      // union'd write — the diamond shape the registry lints against —
      // so it is persisted like any other seam and released with them
      // (r13 ADVICE: best-effort exchange reuse is not ownership)
      val b = BleuEval.bleuStats(BleuEval.bleuPairsOf(docs),
        retain = caches += _).persist()
      caches += b
      val bleu = b.groupBy(col("n"))
        .agg(sum(col("matches")).as("matches"),
          sum(col("total")).as("cand_total"))
        .select(lit("bleu").as("metric"), col("n"), col("matches"),
          col("cand_total"), lit(0L).as("ref_total"))
      // lengths sum ONCE per pair: read them off the n=1 rows. coalesce:
      // an EMPTY micro-batch (a trigger with no new data) makes this
      // grouping-less aggregate emit one all-NULL row, which would break
      // the all-BIGINT exact-sums encoding downstream (review finding)
      val lens = b.filter(col("n") === 1)
        .agg(coalesce(sum(col("cand_len")), lit(0L)).as("cand_total"),
          coalesce(sum(col("ref_len")), lit(0L)).as("ref_total"))
        .select(lit("bleu_len").as("metric"), lit(0L).as("n"),
          lit(0L).as("matches"), col("cand_total"), col("ref_total"))
      val chrf = BleuEval.chrfStats(BleuEval.chrfPairsOf(docs),
          retain = caches += _)
        .groupBy(col("n"))
        .agg(sum(col("matches")).as("matches"),
          sum(col("cand_total")).as("cand_total"),
          sum(col("ref_total")).as("ref_total"))
        .select(lit("chrf").as("metric"), col("n"), col("matches"),
          col("cand_total"), col("ref_total"))
      // ROUGE-L completes the trio (round 14): the LCS sums are
      // pair-local exactly like BLEU/chrF's, one all-BIGINT row —
      // metric='rouge', n=0, (Σ lcs, Σ cand_len, Σ ref_len). Same
      // empty-batch coalesce guard as `lens`.
      val rouge = BleuEval.rougeRows(BleuEval.rougePairsOf(docs))
        .agg(coalesce(sum(col("lcs")), lit(0L)).as("matches"),
          coalesce(sum(col("cand_len")), lit(0L)).as("cand_total"),
          coalesce(sum(col("ref_len")), lit(0L)).as("ref_total"))
        .select(lit("rouge").as("metric"), lit(0L).as("n"),
          col("matches"), col("cand_total"), col("ref_total"))
      bleu.unionByName(lens).unionByName(chrf).unionByName(rouge)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$root/stats/batch=$batchId")
    } finally caches.foreach(_.unpersist())
  }

  /** The cumulative corpus view: per (metric, n) merged sums plus the
    * DIV-exact micro precision/recall (for 'bleu_len', p_micro is the
    * corpus cand/ref length ratio — the brevity-penalty input).
    */
  def corpus(spark: SparkSession, root: String): DataFrame =
    readParts(spark, s"$root/stats", -1L, StatSchema)
      .groupBy("metric", "n")
      .agg(sum(col("matches")).as("matches"),
        sum(col("cand_total")).as("cand_total"),
        sum(col("ref_total")).as("ref_total"))
      .withColumn("p_micro",
        when(col("metric") === "bleu_len",
          when(col("ref_total") > 0,
            expr("cand_total * 1000000 DIV ref_total")).otherwise(0L))
        .otherwise(when(col("cand_total") > 0,
          expr("matches * 1000000 DIV cand_total")).otherwise(0L)))
      .withColumn("r_micro",
        when(col("metric").isin("chrf", "rouge") && col("ref_total") > 0,
          expr("matches * 1000000 DIV ref_total")).otherwise(0L))
      .orderBy("metric", "n")

  /** Start the audit on a streaming `docs` frame (doc_id, text). */
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
