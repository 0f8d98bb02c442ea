package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.pipeline.Dedup

/** Streaming near-dup ingest against a PERSISTED INVERTED INDEX: each
  * micro-batch shingles only its own docs, joins its gram hashes against
  * the survivor gram table, flags batch docs that near-duplicate the
  * index (or a smaller-id doc of their own batch), and appends the
  * survivors' payloads/grams/sizes to the index tables.
  *
  * Steady-state cost per micro-batch: shingling is O(batch) — index
  * TEXT is never re-processed; the candidate join reads the columnar
  * gram table (two longs per row) once, which a deployment bounds by
  * bucketing/sorting it on `g` so the join prunes to matching ranges;
  * pair enumeration is O(batch·df). Jaccard denominators come from the
  * persisted per-doc size table, fetched only for candidate docs.
  *
  * Skew/df cap (`maxDf`): grams whose total frequency (index + batch)
  * exceeds the cap are excluded from candidates AND from both docs'
  * sizes — Jaccard over the rare-gram space, as in
  * `Dedup.jaccardPairs(maxDf)`. Only grams present in the current batch
  * can go hot (an index-only gram never joins anything), so the cap
  * needs no global df table.
  *
  * Drop rule (deterministic keeper-selection): a batch doc is flagged
  * if it pairs with any index doc, or with any SMALLER-id doc of its
  * own batch (whether or not that doc is itself flagged).
  *
  * Exactly-once effect under at-least-once `foreachBatch`: every write
  * lands in a `batch=<id>` partition with OVERWRITE semantics, and all
  * index reads exclude the batch being (re)written — a replayed
  * micro-batch recomputes the same deterministic decision against the
  * same prior state and overwrites itself.
  */
object IncrementalDedupStream {
  private val DocSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))
  private val GramSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("g", LongType)))
  private val SizeSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("n0", LongType)))

  /** `batch=<id>` partition dirs under `root`, minus the one being
    * rewritten — via the Hadoop FileSystem API, so s3a://, hdfs:// and
    * file:// layouts all work (java.io.File would silently list nothing
    * on a remote filesystem and dedup would quietly stop).
    */
  private[streaming] def parts(spark: SparkSession, root: String,
      exclude: Long): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith("batch="))
      .filterNot(_.getName == s"batch=$exclude")
      .map(_.toString).toSeq
  }

  private[streaming] def readParts(spark: SparkSession, root: String,
      exclude: Long, schema: StructType): DataFrame = {
    val ps = parts(spark, root, exclude)
    if (ps.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else spark.read.parquet(ps: _*)
      .select(schema.fieldNames.toSeq.map(col): _*)
  }

  private val TombSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("up_to", LongType)))

  /** Like [[readParts]] but keeps the `batch` partition column (via
    * basePath), for readers that filter on entry age.
    */
  private[streaming] def readPartsWithBatch(spark: SparkSession, root: String,
      exclude: Long, schema: StructType): DataFrame = {
    val ps = parts(spark, root, exclude)
    val withBatch = StructType(schema.fields :+
      StructField("batch", LongType))
    if (ps.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], withBatch)
    else spark.read.option("basePath", root).parquet(ps: _*)
      .select((schema.fieldNames.toSeq :+ "batch").map(col): _*)
      .withColumn("batch", col("batch").cast("long"))
  }

  /** One (doc_id → max up_to) row per tombstoned doc: an index entry
    * written in batch B is dead iff B < up_to. Batch-scoped (not
    * id-scoped) so a doc REMOVED and later RE-ADDED matches again from
    * its re-add batch onward.
    */
  private def tombstones(spark: SparkSession,
      indexPath: String): DataFrame =
    readParts(spark, s"$indexPath/tombstones", -1L, TombSchema)
      .groupBy("doc_id").agg(max("up_to").as("up_to"))

  /** Drop index entries superseded by a tombstone: rows whose partition
    * batch precedes the doc's tombstone horizon. Covers both corpus
    * REMOVALS (the doc must stop flagging new docs — the new doc is the
    * only copy now) and CHANGES (the old version's grams must not flag
    * anyone, including the doc's own new version).
    */
  private def liveEntries(df: DataFrame, tombs: DataFrame): DataFrame =
    df.join(broadcast(tombs), Seq("doc_id"), "left")
      .filter(col("up_to").isNull || col("batch") >= col("up_to"))
      .drop("up_to", "batch")

  /** One micro-batch. Public so the batch tier (and the spec) can drive
    * the identical body without a stream.
    */
  def ingestBatch(batch: DataFrame, batchId: Long, indexPath: String,
      flaggedPath: String, threshold: Double, maxDf: Int,
      excludeSelfPairs: Boolean = false): Unit = {
    val spark = batch.sparkSession
    val b = batch.select("doc_id", "text").persist()
    val bGrams = b.select(col("doc_id"),
      explode(Dedup.shingleHashes(col("text"))).as("g")).persist()
    // consumed twice (size join + index write) — persist, or the
    // shingling pass the persisted-index design exists to avoid runs
    // again per use
    val bSizes = b.select(col("doc_id"),
      size(Dedup.shingleHashes(col("text"))).cast("long").as("n0"))
      .persist()

    // tombstones (written by CrawlDiffStream for removed/changed docs)
    // take effect immediately — superseded entries are dead for matching
    // from the tombstone's batch onward; `vacuum` reclaims the physical
    // rows later. Id-sized, broadcast.
    val tombs = tombstones(spark, indexPath)
    val iGrams = liveEntries(readPartsWithBatch(
      spark, s"$indexPath/grams", batchId, GramSchema), tombs)
    val iSizes = liveEntries(readPartsWithBatch(
      spark, s"$indexPath/sizes", batchId, SizeSchema), tombs)
    // index gram rows that share a gram with the batch — everything the
    // candidate join and the df cap need; batch gram sets are small, so
    // the membership probe broadcasts
    val iRel = iGrams
      .join(broadcast(bGrams.select("g").distinct()), Seq("g"))
      .persist()

    // total df (index + batch) per batch-present gram → hot set
    val hot =
      if (maxDf <= 0)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
          StructType(Seq(StructField("g", LongType))))
      else bGrams.groupBy("g").agg(count(lit(1)).as("cb"))
        .join(iRel.groupBy("g").agg(count(lit(1)).as("ci")),
          Seq("g"), "left")
        .filter(col("cb") + coalesce(col("ci"), lit(0L)) > maxDf)
        .select("g")
    val bK = bGrams.join(hot, Seq("g"), "left_anti").persist()
    val iK = iRel.join(hot, Seq("g"), "left_anti")

    // rare-gram sizes: raw count minus the doc's hot grams
    def sized(sizes: DataFrame, grams: DataFrame): DataFrame =
      sizes.join(grams.join(hot, Seq("g"))
          .groupBy("doc_id").agg(count(lit(1)).as("d")),
        Seq("doc_id"), "left")
        .select(col("doc_id"),
          (col("n0") - coalesce(col("d"), lit(0L))).as("n"))
    val bN = sized(bSizes, bGrams)
    val iN = sized(iSizes, iRel)

    def jaccardOk(i: org.apache.spark.sql.Column,
        na: org.apache.spark.sql.Column,
        nb: org.apache.spark.sql.Column) =
      i / (na + nb - i) >= threshold

    // batch × index candidates: batch side is always the dropped side.
    // `excludeSelfPairs` is the snapshot-update mode (CrawlDiffStream):
    // a changed doc's NEW version must not be flagged as a near-dup of
    // its own stale index entry — same id means replacement, not dup.
    val crossCand = bK.select(col("doc_id").as("bd"), col("g"))
      .join(iK.select(col("doc_id").as("idoc"), col("g")), Seq("g"))
    val crossDrops = (if (excludeSelfPairs)
        crossCand.filter(col("bd") =!= col("idoc")) else crossCand)
      .groupBy("bd", "idoc").agg(count(lit(1)).as("i"))
      .join(bN.select(col("doc_id").as("bd"), col("n").as("na")), "bd")
      .join(iN.select(col("doc_id").as("idoc"), col("n").as("nb")), "idoc")
      .filter(jaccardOk(col("i"), col("na"), col("nb")))
      .select(col("bd").as("doc_id"))

    // batch-internal candidates: posting enumeration, larger id drops
    val intraDrops = bK.groupBy("g")
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(explode(col("ids")).as("da"), col("ids"))
      .select(col("da"), explode(col("ids")).as("db"))
      .filter(col("da") < col("db"))
      .groupBy("da", "db").agg(count(lit(1)).as("i"))
      .join(bN.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(bN.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .filter(jaccardOk(col("i"), col("na"), col("nb")))
      .select(col("db").as("doc_id"))

    val drops = crossDrops.union(intraDrops).distinct().persist()
    drops.write.mode("overwrite")
      .parquet(s"$flaggedPath/batch=$batchId")
    val survivors = b.join(drops, Seq("doc_id"), "left_anti").persist()
    survivors.write.mode("overwrite")
      .parquet(s"$indexPath/docs/batch=$batchId")
    // persist the survivors' RAW grams/sizes — the inverted index the
    // next batch joins against without touching any text
    bGrams.join(drops, Seq("doc_id"), "left_anti")
      .write.mode("overwrite").parquet(s"$indexPath/grams/batch=$batchId")
    bSizes.join(drops, Seq("doc_id"), "left_anti")
      .write.mode("overwrite").parquet(s"$indexPath/sizes/batch=$batchId")

    Seq(survivors, drops, bK, iRel, bGrams, bSizes, b)
      .foreach(_.unpersist())
  }

  /** Physically reclaim tombstoned docs: rewrite each index partition
    * minus the tombstoned ids, then clear the tombstone markers. Safe to
    * run any time the stream is quiescent, idempotent, and crash-safe at
    * every boundary: each partition overwrite is the same `batch=<id>`
    * discipline the stream uses; a crash mid-vacuum leaves the remaining
    * tombstones in place, and an anti-join against rows already rewritten
    * is a no-op. Markers are deleted LAST — only after every partition no
    * longer contains the ids they name.
    */
  def vacuum(spark: SparkSession, indexPath: String): Unit = {
    val tombs = tombstones(spark, indexPath).persist()
    if (tombs.isEmpty) { tombs.unpersist(); return }
    for ((sub, schema) <- Seq(("docs", DocSchema), ("grams", GramSchema),
        ("sizes", SizeSchema));
        part <- parts(spark, s"$indexPath/$sub", -1L)) {
      val b = part.split("batch=").last.toLong
      // read → drop superseded rows → overwrite the SAME partition;
      // localCheckpoint materializes the survivors before the overwrite
      // truncates the files the plan was reading from
      spark.read.parquet(part)
        .select(schema.fieldNames.toSeq.map(col): _*)
        .join(broadcast(tombs.filter(col("up_to") > b).select("doc_id")),
          Seq("doc_id"), "left_anti")
        .localCheckpoint(true)
        .write.mode("overwrite").parquet(part)
    }
    tombs.unpersist()
    val p = new org.apache.hadoop.fs.Path(s"$indexPath/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
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
