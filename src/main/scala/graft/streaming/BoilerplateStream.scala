package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import IncrementalDedupStream.{parts, readParts, readPartsWithBatch}

/** Streaming per-source boilerplate removal — the ingest-time twin of
  * [[graft.pipeline.Dedup.stripBoilerplate]], completing the deployment
  * set the other pipeline batch operators already have (the round-6 gap:
  * `domainScoreGate` got its streaming shape, boilerplate strip didn't).
  *
  * Unlike the arrival-order dedup streams, boilerplate is a
  * CORPUS-RELATIVE property: a span is chrome when it sits on
  * `max(minDocs, ceil(minFrac · |docs(source)|))` distinct documents of
  * its source, so a batch-1 doc can become strippable only when batch-9
  * pushes its banner over the bar. This twin is therefore EXACT, not
  * first-keeps: it maintains per-(source, gram) distinct-doc counts and
  * per-source doc counts across batches, recomputes each touched
  * source's hot-span set, and when a source's hot set CHANGES it
  * re-emits that source's docs re-stripped — the retroactive-correction
  * discipline of `AnomalyStream` (where a late baseline event clears an
  * earlier spike's flag). The "current answer" view is
  * [[latestOutput]]: for every doc, the emission from the largest
  * batch, which is provably the strip against its source's FINAL hot
  * set — so the final view equals the batch operator on the union of
  * all batches, under ANY batch split (BoilerplateStreamSpec pins it).
  *
  * Per micro-batch cost: shingling is O(batch); count updates are
  * APPEND-ONLY increments (the totals read sums parts, pruned to the
  * batch's touched sources via a broadcast); the re-strip set is the
  * docs of sources whose hot set actually changed. In the steady state
  * real chrome sits on ~100% of a source's pages and body spans near
  * df 1 — far from the minFrac bar from both sides — so hot sets
  * stabilize and re-emits vanish; the adversarial worst case (a span
  * hovering AT the bar) re-strips one source's docs per flip, bounded
  * by that source's size, never the corpus.
  *
  * Exactly-once effect under at-least-once `foreachBatch`: every write
  * lands in a `batch=<id>` partition with OVERWRITE semantics and every
  * state read excludes the partition being (re)written — a replayed
  * batch recomputes the same deterministic result and overwrites
  * itself, the same discipline as [[IncrementalDedupStream]].
  *
  * State under `indexPath`:
  *   - `docs/batch=<id>`      (doc_id, source, text) — doc store, read
  *     back only for changed-source re-strips
  *   - `counts/batch=<id>`    (source, g, dc) — distinct-doc df
  *     INCREMENTS for this batch's grams
  *   - `srcounts/batch=<id>`  (source, nd) — per-source doc-count
  *     increments
  *   - `hot/batch=<id>`       (source, g) — snapshot of each touched
  *     source's hot set as of this batch
  *   - `touched/batch=<id>`   (source) — marker naming the sources
  *     snapshotted in this batch (so an EMPTY hot set is still a
  *     snapshot, distinguishable from "never computed")
  */
object BoilerplateStream {
  private val OutSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text_clean", StringType)))
  private val DocSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("source", StringType),
    StructField("text", StringType)))
  private val CountSchema = StructType(Seq(
    StructField("source", StringType), StructField("g", LongType),
    StructField("dc", LongType)))
  private val SrcCountSchema = StructType(Seq(
    StructField("source", StringType), StructField("nd", LongType)))
  private val HotSchema = StructType(Seq(
    StructField("source", StringType), StructField("g", LongType)))
  private val SrcSchema = StructType(Seq(StructField("source", StringType)))

  /** Position-free distinct (doc_id, source, g) — the df-count gram
    * space, identical to the batch operator's.
    */
  private def docGrams(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), col("source"),
        split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= n)
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(0), size(col("t")) - n)).as("pos"), col("t"))
      .select(col("doc_id"), col("source"),
        xxhash64((0 until n).map(j =>
          element_at(col("t"), col("pos") + j + 1)): _*).as("g"))
      .distinct()

  /** Strip `docs` against the given (source, g) hot set — the identical
    * covered-position/reassembly core as the batch operator, including
    * the every-doc-gets-a-row contract (fully-covered → "").
    */
  private def stripAgainst(docs: DataFrame, hot: DataFrame,
      n: Int): DataFrame = {
    val base = docs.select(col("doc_id"), col("source"),
      split(col("text"), " ").as("t"))
    val grams = base.filter(size(col("t")) >= n)
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(0), size(col("t")) - n)).as("pos"), col("t"))
      .select(col("doc_id"), col("source"), col("pos"),
        xxhash64((0 until n).map(j =>
          element_at(col("t"), col("pos") + j + 1)): _*).as("g"))
    val covered = grams.join(hot, Seq("source", "g"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("p"))
      .distinct()
    val toks = base
      .select(col("doc_id"), posexplode(col("t")).as(Seq("p", "tok")))
    val cleaned = toks.join(covered, Seq("doc_id", "p"), "left_anti")
      .groupBy("doc_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("p"), col("tok")))),
          x => x.getField("tok")), " ").as("text_clean"))
    base.select("doc_id").join(cleaned, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /** One micro-batch of (doc_id, source, text). Public so the spec can
    * drive the exact body without a stream.
    */
  def ingestBatch(batch: DataFrame, batchId: Long, indexPath: String,
      outPath: String, n: Int = 4, minFrac: Double = 0.5,
      minDocs: Int = 2): Unit = {
    val spark = batch.sparkSession
    val b = batch.select("doc_id", "source", "text").persist()
    b.write.mode("overwrite").parquet(s"$indexPath/docs/batch=$batchId")

    val touchedSrc = b.select("source").distinct().persist()

    // this batch's df increments (distinct docs per (source, g)) and
    // doc-count increments — append-only state, summed at read time
    val cInc = docGrams(b, n)
      .groupBy("source", "g").agg(count(lit(1)).as("dc")).persist()
    cInc.write.mode("overwrite")
      .parquet(s"$indexPath/counts/batch=$batchId")
    val nInc = b.groupBy("source").agg(count(lit(1)).as("nd")).persist()
    nInc.write.mode("overwrite")
      .parquet(s"$indexPath/srcounts/batch=$batchId")

    // running totals for the TOUCHED sources only (broadcast prune) —
    // prior parts read from disk, this batch's increments added from
    // the in-memory frames so a replay never reads its own half-write
    val cTot = readParts(spark, s"$indexPath/counts", batchId, CountSchema)
      .join(broadcast(touchedSrc), Seq("source"))
      .union(cInc.select("source", "g", "dc"))
      .groupBy("source", "g").agg(sum(col("dc")).as("dc"))
    val nTot = readParts(spark, s"$indexPath/srcounts", batchId,
        SrcCountSchema)
      .join(broadcast(touchedSrc), Seq("source"))
      .union(nInc.select("source", "nd"))
      .groupBy("source").agg(sum(col("nd")).as("nd"))

    // the batch operator's hotness rule, verbatim
    val newHot = cTot.join(nTot, Seq("source"))
      .filter(col("dc") >=
        greatest(lit(minDocs.toLong), ceil(col("nd") * minFrac)))
      .select("source", "g").persist()

    // previous snapshot per touched source = the hot rows of the last
    // batch whose `touched` marker names it (empty set if never touched)
    val lastSnap = readPartsWithBatch(spark, s"$indexPath/touched",
        batchId, SrcSchema)
      .join(broadcast(touchedSrc), Seq("source"))
      .groupBy("source").agg(max(col("batch")).as("lb"))
    val prevHot = readPartsWithBatch(spark, s"$indexPath/hot", batchId,
        HotSchema)
      .join(lastSnap, Seq("source"))
      .filter(col("batch") === col("lb"))
      .select("source", "g")

    // sources whose hot set changed need their WHOLE doc set re-stripped
    // and re-emitted — the retroactive correction
    val changed = newHot.withColumn("a", lit(1))
      .join(prevHot.withColumn("b", lit(1)), Seq("source", "g"),
        "full_outer")
      .filter(col("a").isNull || col("b").isNull)
      .select("source").distinct().persist()

    val storeDocs = readParts(spark, s"$indexPath/docs", batchId,
        DocSchema)
      .join(broadcast(changed), Seq("source"))
      .select("doc_id", "source", "text")
    val emit = b.select("doc_id", "source", "text").union(storeDocs)

    stripAgainst(emit, newHot, n)
      .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")

    newHot.write.mode("overwrite")
      .parquet(s"$indexPath/hot/batch=$batchId")
    touchedSrc.write.mode("overwrite")
      .parquet(s"$indexPath/touched/batch=$batchId")

    Seq(changed, newHot, nInc, cInc, touchedSrc, b).foreach(_.unpersist())
  }

  /** The stream's current answer: each doc's emission from the largest
    * batch — by construction the strip against its source's latest hot
    * set, which after the final batch is the batch operator's.
    */
  def latestOutput(spark: SparkSession, outPath: String): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy(col("batch").desc)
    readPartsWithBatch(spark, outPath, -1L, OutSchema)
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select("doc_id", "text_clean")
  }

  /** Latest hot-span snapshot per source (the state a deployment would
    * inspect to see what is being stripped).
    */
  def hotSet(spark: SparkSession, indexPath: String): DataFrame = {
    val lastSnap = readPartsWithBatch(spark, s"$indexPath/touched", -1L,
        SrcSchema)
      .groupBy("source").agg(max(col("batch")).as("lb"))
    readPartsWithBatch(spark, s"$indexPath/hot", -1L, HotSchema)
      .join(lastSnap, Seq("source"))
      .filter(col("batch") === col("lb"))
      .select("source", "g")
  }

  /** Fold the per-batch count increments (and hot/touched snapshots)
    * into one partition so state reads stop scaling with batch count —
    * the maintenance move `vacuum` is for the dedup streams. Run while
    * the stream is quiescent.
    *
    * The NEWEST partition of each state dir is never folded: if the
    * stream crashed mid-batch, that batch replays on restart and its
    * reads exclude its own partition — folding history into it would
    * make the replay exclude ALL history. Folding only the
    * strictly-older (necessarily committed) parts keeps replay exact.
    *
    * Crash-safe via the shared [[CompactSwap.foldCompact]] `.SWAP`-
    * marker protocol, per state dir (crash-boundary matrix spec'd in
    * BoilerplateStreamSpec against the shared utility).
    */
  def compact(spark: SparkSession, indexPath: String): Unit = {
    def idOf(p: String) = p.split("batch=").last.toLong

    def swap(sub: String)(merged: Seq[String] => DataFrame): Unit =
      CompactSwap.foldCompact(spark, s"$indexPath/$sub")(merged)

    swap("counts") { ps =>
      spark.read.parquet(ps: _*).select("source", "g", "dc")
        .groupBy("source", "g").agg(sum(col("dc")).as("dc")) }
    swap("srcounts") { ps =>
      spark.read.parquet(ps: _*).select("source", "nd")
        .groupBy("source").agg(sum(col("nd")).as("nd")) }
    // hot + touched fold to the latest snapshot per source AMONG THE
    // FOLDED PARTS; a source also touched in the newest (unfolded)
    // partition keeps duplicate older rows, which readers already
    // resolve by max batch. Both dirs share one lastSnap so they fold
    // consistently (they are always written together per batch).
    def withBatch(root: String, ps: Seq[String], names: Seq[String]) =
      spark.read.option("basePath", root).parquet(ps: _*)
        .select((names :+ "batch").map(col): _*)
        .withColumn("batch", col("batch").cast("long"))
    val tRoot = s"$indexPath/touched"
    val tFoldable = {
      val ps = parts(spark, tRoot, -1L)
      if (ps.size < 3) Seq.empty
      else { val lastId = ps.map(idOf).max; ps.filter(idOf(_) < lastId) }
    }
    if (tFoldable.nonEmpty) {
      val lastSnapF = withBatch(tRoot, tFoldable, Seq("source"))
        .groupBy("source").agg(max(col("batch")).as("lb"))
        .localCheckpoint(true)
      swap("hot") { fold =>
        withBatch(s"$indexPath/hot", fold, Seq("source", "g"))
          .join(lastSnapF, Seq("source"))
          .filter(col("batch") === col("lb")).select("source", "g") }
      swap("touched") { _ => lastSnapF.select("source") }
    }
  }

  /** Start the ingest on a streaming (doc_id, source, text) frame. */
  def start(docs: DataFrame, indexPath: String, outPath: String,
      n: Int, minFrac: Double, minDocs: Int,
      checkpoint: String): StreamingQuery = {
    val body: (DataFrame, Long) => Unit =
      (b, id) => ingestBatch(b, id, indexPath, outPath, n, minFrac, minDocs)
    docs.writeStream
      .foreachBatch(body)
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
