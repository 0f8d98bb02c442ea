package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

/** EXACTLY-ONCE keyed sink over at-least-once foreachBatch — the
  * upgrade path from the engine's (and the reference's) at-least-once
  * delivery contract (SURVEY ST8: `Decisions.Kinesis` redelivers after
  * a crash between handler success and checkpoint save; so does
  * foreachBatch between sink write and stream-checkpoint commit). The
  * handler-side dedup the reference leaves to the application is
  * implemented here as a TRANSACTIONAL MERGE sink: replayed input,
  * identical observable table.
  *
  * The sink is a keyed latest-wins table — (k, v, seq), the
  * `r_merge_upsert` machinery (`max_by(v, seq)`), demonstrated on the
  * checkpoint analog (latest event per partition key). Two mechanisms
  * compose into exactly-once:
  *
  *  - VERSIONED COMMITS: each applied batch writes a whole new table
  *    version `v=<n+1>/data` and then a `_commit` marker recording the
  *    batch id. Readers resolve ONLY the highest committed version; a
  *    crash between data write and marker leaves an uncommitted dir
  *    that readers ignore and the batch's redelivery overwrites.
  *  - REPLAY FENCE: foreachBatch ids are monotone, so "batch already
  *    folded" is one comparison against the latest committed marker's
  *    id — a redelivered batch (id ≤ fence) returns without writing.
  *    The fence and the data commit are the SAME marker file, so they
  *    cannot disagree.
  *
  * Crash matrix (single writer — foreachBatch serializes batches):
  * die before data completes → orphan uncommitted dir, replay
  * overwrites it; die between data and marker → same; die after
  * marker but before the STREAM checkpoint commits → replay hits the
  * fence and no-ops. Every path converges to the same table
  * (ExactlyOnceSinkSpec replays each).
  *
  * Scale shape: the merge is one `union` + map-side-combined
  * `max_by` aggregation — the sink shuffles |keys| + |batch| rows per
  * batch, and at warehouse scale the same protocol is what
  * Delta/Iceberg `MERGE INTO` + idempotent-writer options implement
  * with file-level deltas instead of full rewrites; the version-dir
  * rewrite here is the format-free demonstration (documented trade:
  * O(|keys|) per batch, the right demo shape — a real deployment
  * swaps the storage for a table format, keeping the fence logic).
  * [[vacuum]] bounds the version history.
  */
object ExactlyOnceSink {
  private val SinkSchema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType),
    StructField("seq", LongType)))

  private def fs(spark: SparkSession): FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  /** (version, appliedBatchId) of the newest COMMITTED version;
    * (0, −1) for an empty sink. Uncommitted dirs are invisible.
    */
  def latestCommitted(spark: SparkSession, root: String): (Long, Long) = {
    val f = fs(spark)
    val dir = new Path(root)
    if (!f.exists(dir)) return (0L, -1L)
    val committed = f.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toLong)
      .filter(n => f.exists(new Path(s"$root/v=$n/_commit")))
    if (committed.isEmpty) (0L, -1L)
    else {
      val n = committed.max
      val in = f.open(new Path(s"$root/v=$n/_commit"))
      val id = try scala.io.Source.fromInputStream(in).mkString.trim.toLong
        finally in.close()
      (n, id)
    }
  }

  /** The current committed sink table — (k, v, seq). */
  def table(spark: SparkSession, root: String): DataFrame = {
    val (n, _) = latestCommitted(spark, root)
    if (n == 0L)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], SinkSchema)
    else spark.read.schema(SinkSchema).parquet(s"$root/v=$n/data")
  }

  /** Fold one micro-batch of (k, v, seq) rows into the sink. Public so
    * the spec drives the identical body without a stream (the family
    * convention); `batchId` must be the foreachBatch id (monotone).
    */
  def applyBatch(batch: DataFrame, batchId: Long, root: String): Unit = {
    val spark = batch.sparkSession
    val (n, fence) = latestCommitted(spark, root)
    // replay fence: this batch's effects are already inside some
    // committed version — a redelivery must change NOTHING observable
    if (batchId <= fence) return
    val merged = table(spark, root)
      .union(batch.select(col("k"), col("v"), col("seq")))
      .groupBy("k")
      .agg(max_by(col("v"), col("seq")).as("v"), max(col("seq")).as("seq"))
    // overwrite: a crashed earlier attempt at this version is replaced
    merged.write.mode("overwrite").parquet(s"$root/v=${n + 1}/data")
    // THE commit point: marker present ⇒ version readable ∧ fence moved
    val out = fs(spark).create(
      new Path(s"$root/v=${n + 1}/_commit"), true)
    try out.writeBytes(s"$batchId\n") finally out.close()
  }

  /** Drop every version below the newest committed one — the retention
    * knob that stops version history growing with batch count. Safe
    * between batches (foreachBatch serializes the single writer).
    */
  def vacuum(spark: SparkSession, root: String): Unit = {
    val f = fs(spark)
    val (keep, _) = latestCommitted(spark, root)
    if (!f.exists(new Path(root))) return
    f.listStatus(new Path(root)).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith("v=") &&
        p.getName.stripPrefix("v=").toLong < keep)
      .foreach(p => f.delete(p, true))
  }

  /** Start the checkpoint-analog materialization on a streaming events
    * frame: latest event per partition key, exactly once.
    */
  def start(events: DataFrame, root: String,
      checkpoint: String): StreamingQuery = {
    val body: (DataFrame, Long) => Unit = (b, id) =>
      applyBatch(b.select(col("user_id").as("k"),
        col("event_type").as("v"), col("event_id").as("seq")), id, root)
    events.writeStream
      .foreachBatch(body)
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
