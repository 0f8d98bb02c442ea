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
      .select(schema.fieldNames.map(col): _*)
  }

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

    val iGrams = readParts(spark, s"$indexPath/grams", batchId, GramSchema)
    val iSizes = readParts(spark, s"$indexPath/sizes", batchId, SizeSchema)
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
