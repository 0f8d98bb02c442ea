package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermarked event-time aggregation over the record envelope — the
  * streaming side of SURVEY §2.6 ST14 (an engine extension: the reference
  * never uses its timestamp beyond metadata pass-through).
  *
  * The same expressions run in batch (EventWindows queries, DuckDB-
  * oracled) and here under `readStream`; StreamingWindowSpec pins that the
  * two agree on the closed windows.
  */
object WindowedStreams {
  /** Tumbling per-type counts with a watermark: late data beyond
    * `lateness` is dropped, windows close and emit in append mode.
    */
  def tumblingCounts(records: DataFrame, window_ : String,
      lateness: String): DataFrame =
    records
      .withWatermark("approximateArrivalTimestamp", lateness)
      .groupBy(
        window(col("approximateArrivalTimestamp"), window_).as("w"),
        col("partitionKey"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("partitionKey"),
        col("n"))

  /** Streaming dedup on the sequence number within the watermark horizon —
    * the streaming twin of ST8's `dropDuplicates` batch analog: a
    * redelivered record inside the horizon is suppressed with bounded
    * state (the store evicts keys older than the watermark).
    */
  def dedupWithinWatermark(records: DataFrame, lateness: String): DataFrame =
    records
      .withWatermark("approximateArrivalTimestamp", lateness)
      .dropDuplicatesWithinWatermark("sequenceNumber")

  /** Stream-STREAM interval join: left records matched to same-key right
    * records that arrived within `maxDelay` BEFORE them (the
    * click-to-impression / event-to-cause shape). Both sides carry
    * watermarks and the join condition bounds event time on both ends,
    * which is exactly what Structured Streaming needs to know when
    * buffered right-side state can be dropped — without the time bound
    * the state store grows forever. One shuffle per side on the join
    * key; state is O(key × maxDelay-window).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, lateness: String,
      maxDelay: String): DataFrame = {
    val l = left
      .withWatermark("approximateArrivalTimestamp", lateness)
      .select(col("partitionKey").as("k"),
        col("sequenceNumber").as("l_seq"),
        col("approximateArrivalTimestamp").as("l_ts"))
    val r = right
      .withWatermark("approximateArrivalTimestamp", lateness)
      .select(col("partitionKey").as("rk"),
        col("sequenceNumber").as("r_seq"),
        col("approximateArrivalTimestamp").as("r_ts"))
    l.join(r, col("k") === col("rk") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $maxDelay") &&
        col("r_ts") <= col("l_ts"))
      .select(col("k"), col("l_seq"), col("r_seq"))
  }

  /** Stream-STREAM band join with NO key: left records matched to ANY
    * right record within ±`deltaSec` — cross-stream temporal
    * correlation ("what else happened near this?"). Structured
    * Streaming REFUSES a stream-stream join without an equality
    * predicate (state has nothing to key on), so the pure
    * |Δt| ≤ δ condition is inexpressible as written; the δ-bucket
    * quantization of [[graft.operators.BandJoin]] manufactures the
    * missing equality — left rows key on their bucket, right rows
    * replicate into bucket±1 — and the exactly-once matching argument
    * carries over unchanged. The event-time bounds in the residual
    * double as the state-cleanup contract: each side's buffered rows
    * drop once the other side's watermark passes their bucket.
    */
  def bandJoinStream(left: DataFrame, right: DataFrame, lateness: String,
      deltaSec: Long): DataFrame = {
    require(deltaSec > 0, s"deltaSec=$deltaSec must be positive")
    val l = left
      .withWatermark("approximateArrivalTimestamp", lateness)
      .select(col("sequenceNumber").as("l_seq"),
        col("approximateArrivalTimestamp").as("l_ts"))
      .withColumn("lband",
        floor(unix_timestamp(col("l_ts")) / deltaSec).cast("long"))
    val r = right
      .withWatermark("approximateArrivalTimestamp", lateness)
      .select(col("sequenceNumber").as("r_seq"),
        col("approximateArrivalTimestamp").as("r_ts"))
      .withColumn("rband0",
        floor(unix_timestamp(col("r_ts")) / deltaSec).cast("long"))
      .withColumn("rband", explode(array(
        col("rband0") - 1, col("rband0"), col("rband0") + 1)))
      .drop("rband0")
    l.join(r, col("lband") === col("rband") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $deltaSec SECONDS") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $deltaSec SECONDS"))
      .select(col("l_seq"), col("r_seq"))
  }

  /** Stream-STREAM interval-OVERLAP join, no key — the streaming twin
    * of [[graft.operators.IntervalJoin]]: each record opens a span of
    * `lLen`/`rLen` seconds (caller-derived, bounded by `maxLenSec`,
    * fail-loud past it) from its watermarked arrival timestamp, and
    * left pairs with right when the closed spans intersect. Structured
    * Streaming rejects the keyless join; the batch operator's
    * covered-bucket replication manufactures the missing equality as
    * in [[bandJoinStream]], except BOTH sides replicate here — with
    * bucket width = `maxLenSec`, a legal span covers at most 2 buckets,
    * so replication is ≤ 2× per side — and the canonical-bucket rule
    * (the pair survives only in the bucket holding `max(lStart,
    * rStart)`, which both spans cover exactly when they overlap) keeps
    * matching exactly-once with no post-join distinct. The length
    * bound is also what makes state droppable: overlap of
    * ≤ maxLenSec-long spans implies |l_ts − r_ts| ≤ maxLenSec, an
    * event-time range on the WATERMARKED columns themselves — the
    * planner's state-cleanup contract. (At query start
    * `StreamingJoinHelper` logs a WARN trying to mine EXTRA state
    * constraints out of the span residual — `ls`/`rs` are derived, not
    * watermarked, columns, so it gives up and falls back to exactly
    * that watermark range. Benign: cleanup comes from the range
    * bounds; the residual only filters.)
    */
  def intervalOverlapStream(left: DataFrame, right: DataFrame,
      lateness: String, maxLenSec: Long, lLen: Column, rLen: Column)
      : DataFrame = {
    require(maxLenSec > 0, s"maxLenSec=$maxLenSec must be positive")
    def side(df: DataFrame, len: Column, tag: String) = {
      val guarded = when(len >= 0 && len <= maxLenSec, len)
        .otherwise(raise_error(concat(lit(
          s"intervalOverlapStream: span length outside [0, $maxLenSec]" +
            " s - raise maxLenSec (state and replication scale with" +
            " it); offending length: "), len)))
      df.withWatermark("approximateArrivalTimestamp", lateness)
        .select(col("sequenceNumber").as(s"${tag}_seq"),
          col("approximateArrivalTimestamp").as(s"${tag}_ts"),
          guarded.cast("long").as(s"${tag}_len"))
        .withColumn(s"${tag}s", unix_timestamp(col(s"${tag}_ts")))
        .withColumn(s"${tag}e", col(s"${tag}s") + col(s"${tag}_len"))
        .withColumn(s"${tag}band", explode(sequence(
          floor(col(s"${tag}s") / maxLenSec).cast("long"),
          floor(col(s"${tag}e") / maxLenSec).cast("long"))))
    }
    val l = side(left, lLen, "l")
    val r = side(right, rLen, "r")
    // the cleanup range is maxLenSec + 1, not maxLenSec: spans build on
    // SECOND-TRUNCATED unix_timestamp while l_ts/r_ts keep sub-second
    // fractions, so truncated-span overlap only implies
    // |l_ts − r_ts| < maxLenSec + 1 — at exactly maxLenSec a
    // genuinely-overlapping boundary pair (ms-precision arrival times)
    // would be dropped by the state bound before the residual could
    // keep it. The residual stays the decision; the range only bounds
    // state.
    val slack = maxLenSec + 1
    l.join(r, col("lband") === col("rband") &&
        col("ls") <= col("re") && col("rs") <= col("le") &&
        col("lband") ===
          floor(greatest(col("ls"), col("rs")) / maxLenSec).cast("long") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $slack SECONDS") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $slack SECONDS"))
      .select(col("l_seq"), col("r_seq"))
  }

  /** Streaming blocklist ingest gate — the apply side of
    * [[graft.pipeline.TextAnalysis.blocklistGate]] in the
    * train-batch-side / apply-stream-side split every corpus-relative
    * gate here uses (domain-LM gate ships KenLM-shaped count maps,
    * the outlier gate ships (μ, C⁻¹); this ships the two gram→category
    * maps — in production the exogenous curated list, here derived
    * from the reference corpus through the SAME
    * [[graft.pipeline.TextAnalysis.blocklistTables]] seam the batch
    * gate uses, so list membership cannot drift between modes).
    * Per-record scoring is one codegen'd column
    * ([[graft.pipeline.TextAnalysis.blocklistScore]], equality with
    * the batch join pipeline pinned in BlocklistSpec) — stateless, so
    * stream ≡ batch under ANY split by construction.
    */
  def blocklistGateStream(records: DataFrame, corpus: DataFrame,
      maxCatHits: Long = graft.pipeline.TextAnalysis.BlockMaxCatHits,
      uniSkip: Int = graft.pipeline.TextAnalysis.BlockUniSkip,
      uniTake: Int = graft.pipeline.TextAnalysis.BlockUniTake,
      biSkip: Int = graft.pipeline.TextAnalysis.BlockBiSkip,
      biTake: Int = graft.pipeline.TextAnalysis.BlockBiTake): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (bl1, bl2) = graft.pipeline.TextAnalysis.blocklistTables(corpus,
      uniSkip, uniTake, biSkip, biTake)
    // limit-bounded by construction (≤ 4096 grams, require-guarded in
    // blocklistTables) — the driver-artifact discipline
    val uni = bl1.as[(String, Int)].collect().toMap
    val bi = bl2.as[(String, Int)].collect().toMap
    val s = graft.pipeline.TextAnalysis.blocklistScore(col("text"), uni, bi)
    records
      .withColumn("text", col("data").cast("string"))
      .withColumn("s", s)
      .filter(greatest(col("s.c0"), col("s.c1"), col("s.c2"))
        <= maxCatHits)
      .select(col("sequenceNumber"), col("partitionKey"), col("text"),
        col("s.c0").as("c0"), col("s.c1").as("c1"), col("s.c2").as("c2"))
  }

  /** Streaming Mahalanobis ingest gate for an embedding stream
    * (vec_id, embedding): drop records scoring above `maxScore`
    * against BATCH-trained (μ, C⁻¹) artifacts — the train-batch-side /
    * apply-stream-side split of [[graft.pipeline.Projection
    * .mahalanobisTop]], same deployment shape as the domain-LM gate
    * (CCNet ships KenLM to workers; this ships a d + d² double
    * artifact). Stateless per-record scoring through the SAME
    * [[graft.pipeline.Projection.scoreFrame]] the batch operator uses,
    * so stream ≡ batch at the 1e-4 grain under any split.
    */
  def embeddingOutlierGate(records: DataFrame, mu: Array[Double],
      inv: Array[Array[Double]], maxScore: Double): DataFrame =
    graft.pipeline.Projection.scoreFrame(records, mu, inv)
      .filter(col("score") <= maxScore)

  /** Streaming ingest filter for a training-data pipeline: decode the
    * payload, gate on quality and EXACT content dup (same rolling-hash
    * fingerprint seen within the watermark horizon ⇒ suppressed with
    * bounded state). The per-row expressions are the SAME codegen columns
    * the batch tier runs (`TextAnalysis.qualityScore`, `RollingHash`) —
    * nothing is reimplemented for streaming, which is the point of
    * building on DataFrames: one operator library, two execution modes.
    * Near-dup (MinHash) stays batch-side — it needs corpus-wide candidate
    * joins, which is a compaction job, not a per-record stream decision.
    */
  /** CCNet-deployment domain-LM gate for a record stream: each payload's
    * bigram cross-entropy against count tables trained on the STATIC
    * `target` corpus; records above `maxCe` (out-of-domain) drop. The
    * trained model — unigram/bigram count maps + vocab size — is a
    * driver-held artifact broadcast to executors, exactly how CCNet
    * ships its KenLM binary to workers; it is vocabulary-bounded (never
    * corpus-sized), the same size class as the engine's codebooks. The
    * scoring itself is stateless per record, so the stream trivially
    * equals the batch operator
    * ([[graft.pipeline.CorpusOps.bigramCrossEntropyAgainst]]) under any
    * batch split — StreamingWindowSpec pins the agreement at the
    * operator's own 1e-4 rounding grain. Records with fewer than two
    * tokens have no bigrams and drop, matching the batch semantics.
    */
  def domainScoreGate(records: DataFrame, target: DataFrame,
      maxCe: Double, maxVocab: Int = 2000000): DataFrame = {
    val spark = target.sparkSession
    import spark.implicits._
    // the ONLY place a potentially corpus-shaped table crosses the
    // driver: the target is a small REFERENCE sample by contract (the
    // CCNet deployment shape — you train the gate on curated Wikipedia,
    // not on the crawl). Guard the contract the way doremiWeights
    // guards its domain list: count the distinct grams FIRST (one
    // distributed aggregate, a scalar to the driver) and fail loud
    // before any collect can OOM the driver on a mis-pointed target.
    // the driver holds one entry per DISTINCT gram, so the guard
    // counts distinct unigrams + bigrams (a long repetitive curated
    // target with a small vocabulary is legal — a total-token proxy
    // would wrongly refuse it). approx_count_distinct at rsd 1% keeps
    // it one shuffle-free HLL aggregate; the ±1% on a memory bound is
    // immaterial (the bigram gram carries a space, a unigram cannot,
    // so the union double-counts nothing)
    val bigramsOf = expr(
      "zip_with(slice(split(text, ' '), 1, size(split(text, ' ')) - 1)," +
        " slice(split(text, ' '), 2, size(split(text, ' ')) - 1)," +
        " (a, b) -> concat(a, ' ', b))")
    val nGrams = target.select(explode(split(col("text"), " ")).as("g"))
      .union(target.select(col("text"))
        .select(explode(bigramsOf).as("g")))
      .agg(approx_count_distinct(col("g"), 0.01).as("n"))
      .as[Long].head()
    // the HLL estimate can UNDERCOUNT by a few rsd's worth in the tail;
    // a fail-loud driver-memory guard must not admit an over-budget
    // vocabulary through estimator error, so the comparison discounts
    // maxVocab by 3× the 1% rsd (a >3-sigma underestimate is
    // negligible). The 3% haircut is immaterial to legitimate targets —
    // they are reference-sample-sized, nowhere near the bound.
    require(nGrams <= maxVocab - 3L * (maxVocab / 100L),
      s"target holds ~$nGrams distinct grams, exceeding maxVocab=" +
        s"$maxVocab (less the 3% estimator margin): domainScoreGate " +
        "trains a DRIVER-held model and is " +
        "only safe on a reference-sample-sized target (use the batch " +
        "join formulation bigramCrossEntropyAgainst for corpus-shaped " +
        "targets)")
    val uni = target.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    val big = target.select(col("text"))
      .select(explode(expr(
        "zip_with(slice(split(text, ' '), 1, size(split(text, ' ')) - 1)," +
          " slice(split(text, ' '), 2, size(split(text, ' ')) - 1)," +
          " (a, b) -> concat(a, ' ', b))")).as("b"))
      .groupBy("b").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    val vsz = uni.size
    val bcU = spark.sparkContext.broadcast(uni)
    val bcB = spark.sparkContext.broadcast(big)
    records
      .withColumn("text", col("data").cast("string"))
      .select(col("sequenceNumber"), col("partitionKey"), col("text"))
      .as[(String, String, String)]
      .flatMap { case (seq, key, text) =>
        val t = text.split(" ")
        if (t.length < 2) None
        else {
          var s = 0.0
          var i = 0
          while (i < t.length - 1) {
            val c2 = bcB.value.getOrElse(t(i) + " " + t(i + 1), 0L)
            val c1 = bcU.value.getOrElse(t(i), 0L)
            s += math.log((c2 + 1.0) / (c1 + vsz)) / math.log(2.0)
            i += 1
          }
          val ce = math.floor(-s / (t.length - 1) * 10000 + 0.5) / 10000.0
          if (ce <= maxCe) Some((seq, key, text, ce)) else None
        }
      }
      .toDF("sequenceNumber", "partitionKey", "text", "ce")
  }

  def qualityGate(records: DataFrame, minQuality: Double,
      lateness: String): DataFrame =
    records
      .withColumn("text", col("data").cast("string"))
      .withColumn("quality",
        graft.pipeline.TextAnalysis.qualityScore(col("text")))
      .filter(col("quality") >= minQuality)
      // exact-dup key is xxhash64 (the batch tier's fingerprint family),
      // NOT the base-31 RollingHash: polynomial hashes collide on
      // classics like "Aa"/"BB", and a collision here silently DROPS a
      // distinct record
      .withColumn("fp", xxhash64(col("text")))
      .withWatermark("approximateArrivalTimestamp", lateness)
      .dropDuplicatesWithinWatermark("fp")
      .select(col("sequenceNumber"), col("partitionKey"),
        col("text"), round(col("quality"), 4).as("quality"))
}
