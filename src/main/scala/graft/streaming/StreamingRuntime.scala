package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.config.QueueConfig
import graft.filters.FilterCompiler
import graft.model.KinesisRecord
import graft.state.CheckpointStore

/** The streaming runtime — Spark-native re-expression of the reference's
  * consume path (SURVEY §3.1, `KinesisMessageQueueImpl` + thread-per-shard
  * `KinesisThreadJobs`):
  *
  *   reference                         → engine
  *   ─────────────────────────────────────────────────────────────────
  *   thread manager + shard tasks      → Structured Streaming micro-batch
  *     (TJ:221-288, Task per shard)      execution (driver schedules,
  *                                       executors own partitions)
  *   lease arbitration (CP:18-95)      → driver partition ownership (no
  *                                       cross-node race by construction);
  *                                       [[CheckpointStore]] keeps the
  *                                       queue-visible sequence table
  *   checkpoint-after-batch (TJ:404-8) → foreachBatch: handler first,
  *                                       offset commit after ⇒ the same
  *                                       at-least-once contract (ST1, ST8)
  *   payload filters (TJ:694-714)      → [[FilterCompiler.compile]] on the
  *                                       decoded body, BEFORE dispatch
  *   pacing (TJ:425-432)               → Trigger.ProcessingTime
  *   graceful shutdown (TJ:824-859)    → query.stop() + status flags
  *
  * Sources implement [[RecordSource]]; a real Kinesis connector
  * (`spark.readStream.format("kinesis")` with the §2.9 options) drops in
  * behind the same trait — poll vs EFO (S1/S2) is a connector option, not
  * an engine concern.
  */
trait RecordSource {
  /** A streaming Dataset in the fixed record-envelope schema (§1.1). */
  def stream(spark: SparkSession): Dataset[KinesisRecord]
}

/** File-backed source for local runs: replays a directory of parquet files
  * shaped like the envelope. Order within a partitionKey follows
  * sequenceNumber, as per-shard order does on Kinesis (ST7).
  */
final class FileRecordSource(path: String) extends RecordSource {
  override def stream(spark: SparkSession): Dataset[KinesisRecord] = {
    import spark.implicits._
    spark.readStream.schema(KinesisRecord.schema).parquet(path)
      .as[KinesisRecord]
  }
}

/** JSON-lines variant of the file source — one envelope object per line
  * (`data` base64 as JSON binary convention). Same trait, different wire
  * format; demonstrates the source surface is format-agnostic.
  */
final class JsonRecordSource(path: String) extends RecordSource {
  override def stream(spark: SparkSession): Dataset[KinesisRecord] = {
    import spark.implicits._
    spark.readStream.schema(KinesisRecord.schema).json(path)
      .as[KinesisRecord]
  }
}

/** Where delivered records go — the `ProcessMessage` handler boundary
  * (K2, `KinesisThreadJobs.cs:711-718`). Return false / throw ⇒ the batch
  * fails ⇒ Spark re-runs it from the last committed offset (E3 semantics).
  */
trait MessageHandler extends Serializable {
  def process(messageId: String, messageBody: Array[Byte],
      messageText: String, partitionKey: String): Boolean
}

/** The K2 delivery boundary as ONE selectable trait: each micro-batch
  * of the record pipeline (with its `__pass` filter verdicts) is handed
  * here. Two implementations ship:
  *
  *  - [[QueueRuntime.HandlerDispatch]] — the reference's contract:
  *    per-record handler dispatch, at-least-once (a crash between
  *    handler success and offset commit redelivers; the handler owns
  *    idempotence, `KinesisThreadJobs.cs:404-408`);
  *  - [[ExactlyOnceDelivery]] — the upgrade: passing records fold into
  *    an [[ExactlyOnceSink]] versioned latest-wins table keyed by
  *    partitionKey; the sink's replay fence absorbs redelivered
  *    batches, so the observable table is exactly-once.
  */
trait DeliverySink extends Serializable {
  /** Fold one micro-batch (pipeline schema incl. `__pass`); `batchId`
    * is the foreachBatch id (monotone per checkpoint lineage).
    *
    * CHECKPOINT-CARDINALITY CONTRACT: `partitionKey` plays the Kinesis
    * SHARD, not a user/entity id. Sinks checkpoint once per distinct
    * key per batch — [[QueueRuntime.HandlerDispatch]] collects one
    * (key, lastSeq, n, dropped) summary row per key to the driver and
    * loops `saveCheckpoint` over them, exactly the reference's
    * per-shard checkpointing (`KinesisThreadJobs.cs:404-408`), which is
    * O(shards) and bounded by stream topology (tens to low thousands).
    * Keying by a high-cardinality id turns that driver loop into the
    * bottleneck; HandlerDispatch guards it with a hard cap
    * (`maxCheckpointKeys`, default 10 000) so the misconfiguration
    * fails loudly on the first batch instead of degrading silently.
    */
  def applyBatch(batch: DataFrame, batchId: Long): Unit
}

/** Exactly-once K2 delivery: passing records fold into the versioned
  * latest-wins table at `root` — (k = partitionKey, v = messageText,
  * seq = numeric sequence). Sequence numbers must parse as longs (true
  * of every fixture and of [[QueueRuntime.push]]'s ids); an id that
  * does NOT — non-numeric, or a real Kinesis ~56-digit number that
  * overflows int64 — ABORTS the batch via raise_error instead of
  * silently casting to null, where `max_by(v, null)` would pick an
  * arbitrary "latest" value (the round-12 advice finding; the batch
  * retry surfaces the config error). A deployment on real Kinesis ids
  * widens the sink's seq to the (length, lexicographic) struct
  * [[QueueRuntime.HandlerDispatch]] already orders by. Filtered
  * records leave no trace here; the queue-visible checkpoint table is
  * the sink itself (latest seq per key), so there is no separate
  * commit that could disagree with the data.
  */
final class ExactlyOnceDelivery(root: String) extends DeliverySink {
  override def applyBatch(batch: DataFrame, batchId: Long): Unit =
    ExactlyOnceSink.applyBatch(
      batch.filter(col("__pass")).select(
        col("partitionKey").as("k"),
        col("messageText").as("v"),
        // try_cast, not cast: under ANSI (the Spark 4 default) a plain
        // cast throws a generic CAST_INVALID_INPUT mid-task; with ANSI
        // off it silently nulls. try_cast + raise_error gives the same
        // loud, self-diagnosing abort in both modes.
        coalesce(expr("try_cast(messageId as bigint)"), raise_error(concat(
          lit("ExactlyOnceDelivery: sequence id not an int64 (real "),
          lit("Kinesis ids need a (length, lex) seq column): "),
          col("messageId")))).as("seq")),
      batchId, root)
}

final class QueueRuntime(
    spark: SparkSession,
    queue: QueueConfig,
    store: CheckpointStore = new CheckpointStore(),
    queueId: String = "q1") {

  QueueConfig.requireValid(queue)

  @volatile private var query: Option[StreamingQuery] = None
  private val delivered = new AtomicLong(0)
  private val filtered = new AtomicLong(0)

  def deliveredCount: Long = delivered.get()
  def filteredCount: Long = filtered.get()

  /** The record pipeline as a pure DataFrame transform (unit-testable in
    * batch, identical in streaming): decode → filter → project.
    */
  def pipeline(records: DataFrame): DataFrame =
    pipelineWithVerdict(records).filter(col("__pass")).drop("__pass")

  /** Pipeline variant keeping dropped records alongside their filter
    * verdict (`__pass`). The streaming path dispatches on the verdict
    * rather than pre-filtering because the reference checkpoints the last
    * FETCHED record of a batch, filtered or not (`KinesisThreadJobs
    * .cs:404-408` saves `records.Last()` after the per-record filter
    * loop), and because the filtered-count metric needs to see the drops.
    */
  def pipelineWithVerdict(records: DataFrame): DataFrame = {
    val text = records.withColumn("messageText",
      col("data").cast("string")) // P1: UTF-8 decode projection
    val pred = FilterCompiler.compile(queue.filters, col("messageText"))
    text.select(
      col("sequenceNumber").as("messageId"), // TJ:689
      col("data").as("messageBody"),
      col("messageText"),
      col("partitionKey"),
      col("approximateArrivalTimestamp"),
      coalesce(col("encryptionType"), lit("None")) // P3, U:173
        .as("encryptionType"),
      pred.as("__pass"))
  }

  /** The reference's K2 dispatch as a [[DeliverySink]] (at-least-once):
    * per-shard ordered serial dispatch + checkpoint-after-batch.
    * `maxCheckpointKeys` enforces the trait's checkpoint-cardinality
    * contract (partitionKey ≈ shard): more distinct keys than this in
    * one batch fails the batch loudly rather than letting the
    * per-key driver checkpoint loop become the silent bottleneck.
    */
  final class HandlerDispatch(handler: MessageHandler,
      maxCheckpointKeys: Int = 10000)
      extends DeliverySink {
    override def applyBatch(batch: DataFrame, batchId: Long): Unit = {
      // Per-shard ordered, serial processing (ST7): group a batch by
      // partitionKey on the executors, dispatch each key's PASSING
      // records in sequence order, record the last fetched sequence per
      // key (TJ:404-408: filtered records advance the checkpoint too).
      // The handler is copied to a LOCAL before the closure: referencing
      // the field would drag `this` (and its $outer runtime, with its
      // SparkSession) into the serialized task.
      val h = handler
      import batch.sparkSession.implicits._
      val results = batch
        .select(col("messageId"), col("messageBody"), col("messageText"),
          col("partitionKey"), col("__pass"))
        .as[(String, Array[Byte], String, String, Boolean)]
        .groupByKey(_._4)
        .mapGroups { (key, it) =>
          var last: String = null
          var n = 0L
          var dropped = 0L
          // Kinesis sequence numbers are decimal strings that grow in
          // numeric value; order numerically via (length, lexicographic)
          it.toSeq.sortBy(r => (r._1.length, r._1)).foreach { r =>
            if (r._5) {
              if (!h.process(r._1, r._2, r._3, r._4))
                throw new RuntimeException( // K2 failure ⇒ batch retry
                  s"Failed to process message: ${r._1}")
              n += 1
            } else dropped += 1
            last = r._1
          }
          (key, last, n, dropped)
        }.collect()
      require(results.length <= maxCheckpointKeys,
        s"${results.length} distinct partitionKeys in one batch exceeds " +
          s"maxCheckpointKeys=$maxCheckpointKeys — partitionKey plays the " +
          "Kinesis SHARD (O(topology) keys), not a user/entity id; keying " +
          "by a high-cardinality id makes the per-key driver checkpoint " +
          "loop the bottleneck (DeliverySink contract)")
      // handler succeeded for the whole batch ⇒ advance the
      // queue-visible checkpoints (commit-after-process = at-least-once)
      results.foreach { case (key, last, n, dropped) =>
        if (last != null)
          store.saveCheckpoint(queue.streamName, queueId, key, last)
        delivered.addAndGet(n)
        filtered.addAndGet(dropped)
      }
    }
  }

  /** Start consuming. Handler runs per record, per partitionKey in
    * sequence order (ST7); checkpoint sequence is saved after each
    * partition's batch slice succeeds (ST1), exactly like
    * `SaveCheckpoint(records.Last())`.
    */
  def start(source: RecordSource, handler: MessageHandler,
      checkpointLocation: String): StreamingQuery =
    start(source, new HandlerDispatch(handler), checkpointLocation)

  /** Start consuming into any [[DeliverySink]] — the one trait behind
    * which the reference's at-least-once dispatch and the exactly-once
    * table upgrade are selectable.
    */
  def start(source: RecordSource, sink: DeliverySink,
      checkpointLocation: String): StreamingQuery = {
    val q = pipelineWithVerdict(source.stream(spark).toDF())
      .writeStream
      .option("checkpointLocation", checkpointLocation)
      .trigger(Trigger.ProcessingTime(
        s"${queue.shardBatchWaitTime} seconds")) // ST9 pacing
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink.applyBatch(batch, id)
      }
      .start()
    query = Some(q)
    q
  }

  /** Producer (K1, `KinesisMessageQueueImpl.cs:99-126`): partition key =
    * message id; append to the stream-backing path.
    */
  def push(targetPath: String, id: String, message: Array[Byte]): Unit = {
    import spark.implicits._
    Seq(KinesisRecord(message, id, id,
      new java.sql.Timestamp(System.currentTimeMillis()), "None"))
      .toDS().write.mode("append").parquet(targetPath)
  }

  /** Connection test (K3): can we read one record from the source path? */
  def testConnection(path: String): String =
    try {
      val n = spark.read.schema(KinesisRecord.schema).parquet(path)
        .limit(1).count()
      s"Connection successful. Stream readable (sampled $n record(s))."
    } catch {
      case e: Exception => s"Connection failed: ${e.getMessage}"
    }

  /** Graceful shutdown (ST13): stop the query, then actually release the
    * queue's leases (the checkpoint saves extended them) so a successor
    * runtime starts immediately instead of waiting out the TTL — the
    * `ReleaseAllLeases` shutdown contract (`KinesisCheckPointer
    * .cs:193-220`).
    */
  def stop(): Unit = {
    query.foreach(_.stop())
    query = None
    store.releaseQueueLeases(queue.streamName, queueId)
  }
}
