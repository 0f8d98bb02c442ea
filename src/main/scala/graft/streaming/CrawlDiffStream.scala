package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.pipeline.TrainingSet

/** Crawl-snapshot ingest: each micro-batch is a FULL crawl dump, and the
  * work done per batch is proportional to what CHANGED, not to the crawl.
  *
  * Per batch: diff the snapshot's content hashes against the previous
  * snapshot's persisted hash table ([[TrainingSet.corpusDiff]] — an
  * id-sized full-outer join, the text never ships), record the verdicts,
  * tombstone the superseded index entries (removed docs entirely;
  * changed docs' pre-batch versions), and forward ONLY `added ∪ changed`
  * docs into the incremental near-dup index
  * ([[IncrementalDedupStream.ingestBatch]], same batchId). Tombstones
  * take effect immediately in the candidate join;
  * [[IncrementalDedupStream.vacuum]] physically reclaims the rows when
  * the stream is quiescent.
  *
  * State layout: `snapPath/batch=<id>` holds the snapshot's (doc_id, h).
  * The previous snapshot = the highest batch id BELOW the current one —
  * so an at-least-once replay diffs against the same predecessor and
  * overwrites its own partitions with identical verdicts (the same
  * `batch=<id>` overwrite discipline as the dedup index).
  *
  * At 100 TB: the diff joins two id+digest tables (16 bytes a row);
  * co-partitioned or bucketed by id it plans exchange-free, and the
  * expensive tiers (shingling, candidate joins) see only the changed
  * slice — the whole point of incremental corpus maintenance.
  */
object CrawlDiffStream {
  private val HashSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("h", StringType)))

  /** Highest `batch=<id>` below `current` under `root`, if any. */
  private def prevBatch(spark: SparkSession, root: String,
      current: Long): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      .collect { case n if n.startsWith("batch=") =>
        n.stripPrefix("batch=").toLong }
      .filter(_ < current).sorted.lastOption
  }

  /** One snapshot. Public so the batch tier (and the spec) can drive the
    * identical body without a stream.
    */
  def ingestSnapshot(snapshot: DataFrame, batchId: Long, snapPath: String,
      diffPath: String, indexPath: String, flaggedPath: String,
      threshold: Double, maxDf: Int): Unit = {
    val spark = snapshot.sparkSession
    val snap = snapshot.select("doc_id", "text").persist()
    val hashes = snap.select(col("doc_id"), md5(col("text")).as("h"))
    val prev = prevBatch(spark, snapPath, batchId) match {
      case Some(id) => spark.read.parquet(s"$snapPath/batch=$id")
        .select(col("doc_id"), col("h"))
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], HashSchema)
    }
    // one definition of the diff rule, shared with p_corpus_diff
    val diff = TrainingSet.corpusDiffHashed(
        prev.withColumnRenamed("h", "oh"),
        hashes.withColumnRenamed("h", "nh"))
      .filter(col("status") =!= "unchanged")
      .persist()
    diff.write.mode("overwrite").parquet(s"$diffPath/batch=$batchId")

    // removed AND changed docs' pre-existing index entries die for
    // matching NOW (batch-scoped tombstone: entries from batches before
    // this one are superseded). Removed: a new doc resembling only a
    // removed doc must be kept — it is the only copy in the corpus.
    // Changed: the OLD version's grams must not flag anyone (neither a
    // third doc resembling the old text nor the doc's own new version);
    // the new version re-enters the index under this batch id, at or
    // past the tombstone horizon, so it matches normally from here on.
    // Written before the ingest so this very batch's candidate join
    // already honors it; replays rewrite the identical tombstones.
    diff.filter(col("status").isin("removed", "changed"))
      .select(col("doc_id"), lit(batchId).as("up_to"))
      .write.mode("overwrite")
      .parquet(s"$indexPath/tombstones/batch=$batchId")

    // only the changed slice pays the expensive tiers
    val toProcess = snap.join(
      diff.filter(col("status").isin("added", "changed"))
        .select("doc_id"), Seq("doc_id"))
    IncrementalDedupStream.ingestBatch(toProcess, batchId, indexPath,
      flaggedPath, threshold, maxDf, excludeSelfPairs = true)

    // the snapshot hash table becomes the next batch's predecessor;
    // written LAST so a crash before this point replays cleanly against
    // the old predecessor
    hashes.write.mode("overwrite").parquet(s"$snapPath/batch=$batchId")
    diff.unpersist(); snap.unpersist()
  }

  /** Start the snapshot ingest on a streaming `docs` frame (doc_id,
    * text); each micro-batch is treated as one full crawl dump.
    */
  def start(docs: DataFrame, snapPath: String, diffPath: String,
      indexPath: String, flaggedPath: String, threshold: Double,
      maxDf: Int, checkpoint: String): StreamingQuery = {
    val body: (DataFrame, Long) => Unit = (b, id) =>
      ingestSnapshot(b, id, snapPath, diffPath, indexPath, flaggedPath,
        threshold, maxDf)
    docs.writeStream
      .foreachBatch(body)
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
