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
  * overwrites it; die between data and marker → same; die MID-MARKER
  * write → only `_commit.tmp` exists (the marker is tmp+rename, so a
  * visible `_commit` is always complete), version stays uncommitted,
  * replay overwrites — and even a corrupt `_commit` reads as
  * uncommitted instead of bricking the sink; die after the rename but
  * before the STREAM checkpoint commits → replay hits the fence and
  * no-ops. Every path converges to the same table
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
  // k is a STRING — Kinesis partition keys are strings (SURVEY §1.1);
  // the checkpoint-analog demo casts its long user ids through
  private val SinkSchema = StructType(Seq(
    StructField("k", StringType), StructField("v", StringType),
    StructField("seq", LongType)))

  // FS derived from the sink ROOT's scheme, not fs.defaultFS — a root
  // on a different filesystem would fail every exists/create Wrong-FS
  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The marker's recorded batch id; None when the marker is ABSENT
    * (the normal uncommitted case) or PARSE-corrupt (empty/truncated/
    * non-numeric — impossible under the tmp+rename protocol but must
    * read as uncommitted, not brick the sink: counting it committed
    * with a garbage fence would throw on every subsequent
    * table()/applyBatch() call forever — the round-11 advice finding).
    *
    * A genuine I/O failure RETHROWS: on a flaky/object-store FS a
    * transient read error on a VALID `_commit` must not silently demote
    * the committed version — the replayed batch would overwrite its
    * data and applyBatch would delete its valid marker under the
    * corrupt-by-construction assumption (the round-12 advice finding).
    * Callers (one micro-batch tick) retry the whole batch instead.
    */
  private def markerBatchId(f: FileSystem, root: String,
      n: Long): Option[Long] = {
    val p = new Path(s"$root/v=$n/_commit")
    if (!f.exists(p)) return None
    val in =
      try f.open(p)
      catch { case _: java.io.FileNotFoundException => return None }
    val s =
      try scala.io.Source.fromInputStream(in).mkString.trim
      catch { case _: java.io.EOFException => return None }
      finally in.close()
    try Some(s.toLong) catch { case _: NumberFormatException => None }
  }

  /** (version, appliedBatchId) of the newest COMMITTED version;
    * (0, −1) for an empty sink. Uncommitted dirs — including dirs whose
    * marker exists but is unreadable/unparsable — are invisible.
    */
  def latestCommitted(spark: SparkSession, root: String): (Long, Long) = {
    val f = fs(spark, root)
    val dir = new Path(root)
    if (!f.exists(dir)) return (0L, -1L)
    val committed = f.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toLong)
      .flatMap(n => markerBatchId(f, root, n).map(id => (n, id)))
    if (committed.isEmpty) (0L, -1L) else committed.maxBy(_._1)
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
    // THE commit point: marker present ⇒ version readable ∧ fence
    // moved. Written ATOMICALLY via tmp + rename (the CompactSwap
    // primitive): fs.create makes a path visible before its bytes are
    // durable, so a crash mid-write would otherwise leave an
    // empty/truncated marker that looked committed (crash-matrix row:
    // die mid-marker-write → tmp only, version stays uncommitted,
    // replay overwrites; die between rename and stream checkpoint →
    // fence catches the replay, same as die-after-marker).
    val f = fs(spark, root)
    val tmp = new Path(s"$root/v=${n + 1}/_commit.tmp")
    val out = f.create(tmp, true)
    try out.writeBytes(s"$batchId\n") finally out.close()
    val marker = new Path(s"$root/v=${n + 1}/_commit")
    // any marker already at n+1 is CORRUPT by construction (a valid one
    // would have made latestCommitted pick n+1 as the fence) — clear it
    // or the rename would fail and re-strand the version
    if (f.exists(marker)) f.delete(marker, false)
    if (!f.rename(tmp, marker))
      throw new java.io.IOException(
        s"commit rename failed for $marker — version left uncommitted")
  }

  /** Drop every version below the newest committed one — the retention
    * knob that stops version history growing with batch count. Safe
    * between batches (foreachBatch serializes the single writer).
    */
  def vacuum(spark: SparkSession, root: String): Unit = {
    val f = fs(spark, root)
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
      applyBatch(b.select(col("user_id").cast("string").as("k"),
        col("event_type").as("v"), col("event_id").as("seq")), id, root)
    events.writeStream
      .foreachBatch(body)
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
