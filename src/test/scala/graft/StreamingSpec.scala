package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.QueueConfig
import graft.filters.{FilterSpec, FilterVerbs, PayloadFilter}
import graft.model.KinesisRecord
import graft.state.CheckpointStore
import graft.streaming._

/** Local-JVM shared sink — executors in local mode share the process, so a
  * static queue observes per-record handler invocations.
  */
object TestSink {
  val seen = new ConcurrentLinkedQueue[(String, String)]() // (key, id)
  val failOnce = new AtomicBoolean(false)
  def reset(): Unit = { seen.clear(); failOnce.set(false) }
}

class CollectingHandler extends MessageHandler {
  override def process(id: String, body: Array[Byte], text: String,
      key: String): Boolean = {
    if (TestSink.failOnce.get() && id == "12") {
      TestSink.failOnce.set(false) // fail exactly once, then recover
      throw new RuntimeException("injected handler failure")
    }
    TestSink.seen.add((key, id)); true
  }
}

/** Streaming-runtime semantics (SURVEY §2.6): filtered dispatch, per-key
  * sequence-ordered delivery, checkpoint-after-batch, at-least-once
  * redelivery after a handler crash, producer round-trip.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  private def rec(key: String, seq: Long, json: String): KinesisRecord =
    KinesisRecord(json.getBytes("UTF-8"), key, seq.toString,
      new Timestamp(1700000000000L + seq * 1000), null)

  private def writeBatch(dir: String, recs: Seq[KinesisRecord]): Unit = {
    import spark.implicits._
    recs.toDS().write.mode("append").parquet(dir)
  }

  private def newQueue(filters: FilterSpec = FilterSpec(Nil)) =
    QueueConfig("teststream", QueueConfig.StartFromOldest,
      filters = filters, shardBatchWaitTime = 1)

  test("pipeline: decode, filter-before-dispatch, null-default projection") {
    import spark.implicits._
    val rt = new QueueRuntime(spark, newQueue(FilterSpec(Seq(
      PayloadFilter("k", FilterVerbs.GreaterThan, "10")))))
    val recs = Seq(
      rec("a", 1, """{"k": 5}"""),   // filtered out ("5" < "10" is false…
      rec("a", 2, """{"k": 95}"""),  // "95" > "10" string-wise → kept
      rec("a", 3, "not json"))       // parse failure → delivered (P8)
    val out = rt.pipeline(recs.toDF()).collect()
    val ids = out.map(_.getAs[String]("messageId")).toSet
    // "5" > "10" lexicographically! — string semantics keep seq 1 too
    assert(ids == Set("1", "2", "3"))
    assert(out.forall(_.getAs[String]("encryptionType") == "None"))
    val rt2 = new QueueRuntime(spark, newQueue(FilterSpec(Seq(
      PayloadFilter("k", FilterVerbs.Equals, "95")))))
    val ids2 = rt2.pipeline(recs.toDF()).collect()
      .map(_.getAs[String]("messageId")).toSet
    assert(ids2 == Set("2", "3")) // eq-match + parse-passthrough only
  }

  test("end-to-end: filtered dispatch, per-key order, checkpoints") {
    TestSink.reset()
    val dir = Files.createTempDirectory("graft-stream").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    // sequence 9 vs 10 checks NUMERIC ordering of decimal-string sequences
    writeBatch(dir, Seq(
      rec("shardA", 9, """{"k": 1}"""), rec("shardA", 10, """{"k": 2}"""),
      rec("shardA", 11, """{"k": 3}"""), rec("shardB", 5, """{"k": 4}"""),
      rec("shardB", 6, """{"nope": 1}""")))
    val store = new CheckpointStore()
    val rt = new QueueRuntime(spark, newQueue(FilterSpec(Seq(
      PayloadFilter("k", FilterVerbs.GreaterThanOrEqual, "1")))), store)
    val q = rt.start(new FileRecordSource(dir), new CollectingHandler, ckpt)
    try q.processAllAvailable() finally rt.stop()

    val byKey = TestSink.seen.toArray.map(_.asInstanceOf[(String, String)])
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(byKey("shardA") == Seq("9", "10", "11")) // numeric seq order
    assert(byKey("shardB") == Seq("5"))             // k-missing filtered
    assert(store.getCheckpoint("teststream", "q1", "shardA").contains("11"))
    // checkpoint advances past FILTERED records too: the reference saves
    // records.Last() of the fetched batch (TJ:405-408), and filtering
    // happens inside ProcessRecordAsync — so shardB checkpoints 6, not 5
    assert(store.getCheckpoint("teststream", "q1", "shardB").contains("6"))
    assert(rt.deliveredCount == 4)
    assert(rt.filteredCount == 1) // the k-missing record on shardB
  }

  test("exactly-once K2 sink behind the runtime: full stream replay " +
      "leaves the sink table byte-identical") {
    val dir = Files.createTempDirectory("graft-xstream").toString
    val sinkRoot = Files.createTempDirectory("graft-xsink").toString
    val ckpt1 = Files.createTempDirectory("graft-xckpt1").toString
    writeBatch(dir, Seq(
      rec("shardA", 9, """{"k": 1}"""), rec("shardA", 10, """{"k": 2}"""),
      rec("shardB", 5, """{"k": 4}"""),
      rec("shardB", 6, """{"nope": 1}"""))) // filtered: no trace in sink
    def runOnce(ckpt: String): Unit = {
      val rt = new QueueRuntime(spark, newQueue(FilterSpec(Seq(
        PayloadFilter("k", FilterVerbs.GreaterThanOrEqual, "1")))))
      val q = rt.start(new FileRecordSource(dir),
        new ExactlyOnceDelivery(sinkRoot), ckpt)
      try q.processAllAvailable() finally rt.stop()
    }
    runOnce(ckpt1)
    def table() = ExactlyOnceSink.table(spark, sinkRoot).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val want = table()
    // latest passing record per key won (k-missing shardB/6 filtered out)
    assert(want.map(t => (t._1, t._3)) ==
      Set(("shardA", 10L), ("shardB", 5L)))
    val fence = ExactlyOnceSink.latestCommitted(spark, sinkRoot)
    // the crash-after-sink-commit-before-stream-checkpoint shape, at its
    // WORST: the entire stream checkpoint is lost, so a restart replays
    // EVERY batch from scratch — the sink's replay fence must absorb
    // them all (batch ids restart at 0 ≤ fence), table unchanged
    runOnce(Files.createTempDirectory("graft-xckpt2").toString)
    assert(table() == want, "replayed stream mutated the sink table")
    assert(ExactlyOnceSink.latestCommitted(spark, sinkRoot) == fence,
      "replay moved the fence — a batch was folded twice")
  }

  test("at-least-once: handler crash aborts batch, restart redelivers") {
    TestSink.reset()
    TestSink.failOnce.set(true)
    val dir = Files.createTempDirectory("graft-stream2").toString
    val ckpt = Files.createTempDirectory("graft-ckpt2").toString
    writeBatch(dir, Seq(
      rec("s", 11, """{"k": 1}"""), rec("s", 12, """{"k": 2}"""),
      rec("s", 13, """{"k": 3}""")))
    val store = new CheckpointStore()
    val rt = new QueueRuntime(spark, newQueue(), store)
    val q1 = rt.start(new FileRecordSource(dir), new CollectingHandler, ckpt)
    intercept[Exception] { q1.processAllAvailable() } // injected crash
    rt.stop()
    // checkpoint NOT advanced past the failed batch
    assert(store.getCheckpoint("teststream", "q1", "s").isEmpty)

    val rt2 = new QueueRuntime(spark, newQueue(), store)
    val q2 = rt2.start(new FileRecordSource(dir), new CollectingHandler, ckpt)
    try q2.processAllAvailable() finally rt2.stop()
    val ids = TestSink.seen.toArray.map(_.asInstanceOf[(String, String)]._2)
    // all three delivered post-recovery; seq 11 seen TWICE (restart replays
    // the uncommitted batch) = at-least-once, matching the reference
    assert(ids.count(_ == "12") >= 1 && ids.count(_ == "13") >= 1)
    assert(ids.count(_ == "11") >= 2)
    assert(store.getCheckpoint("teststream", "q1", "s").contains("13"))
  }

  test("checkpoint-cardinality guard: more distinct keys than " +
      "maxCheckpointKeys fails the batch loudly") {
    // partitionKey plays the SHARD (DeliverySink contract): the per-key
    // driver checkpoint loop is O(distinct keys), so a high-cardinality
    // keying must fail on the first batch, not degrade silently
    TestSink.reset()
    val rt = new QueueRuntime(spark, newQueue())
    val batch = rt.pipelineWithVerdict(
      spark.createDataFrame((1 to 5).map(i =>
        rec(s"user-$i", i.toLong, s"""{"k":$i}"""))))
    val dispatch = new rt.HandlerDispatch(new CollectingHandler,
      maxCheckpointKeys = 3)
    val e = intercept[IllegalArgumentException] {
      dispatch.applyBatch(batch, 0L)
    }
    assert(e.getMessage.contains("partitionKey plays the Kinesis SHARD"))
    // the guard fires AFTER handler processing (commit-after-process:
    // the failed batch redelivers, same as any K2 failure) — reset the
    // sink before proving the shard-like cardinality dispatches fine
    TestSink.reset()
    new rt.HandlerDispatch(new CollectingHandler, maxCheckpointKeys = 5)
      .applyBatch(batch, 0L)
    assert(TestSink.seen.size == 5)
  }

  test("exactly-once delivery aborts on a sequence id that does not " +
      "fit int64 instead of corrupting latest-wins with nulls") {
    val rt = new QueueRuntime(spark, newQueue())
    val root = Files.createTempDirectory("eod-badseq").toString
    // a realistic Kinesis ~56-digit sequence number: cast("long") would
    // silently null it and max_by(v, null) would pick arbitrary values
    val bad = KinesisRecord("{\"k\":1}".getBytes("UTF-8"), "key-1",
      "49590338271490256608559692538361571095921575989136588898",
      new Timestamp(1700000000000L), null)
    val batch = rt.pipelineWithVerdict(spark.createDataFrame(Seq(bad)))
    val e = intercept[Exception] {
      new ExactlyOnceDelivery(root).applyBatch(batch, 0L)
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil
      else String.valueOf(t.getMessage) +: chain(t.getCause)
    assert(chain(e).exists(_.contains("not an int64")),
      s"expected a loud seq-id failure, got: ${chain(e).mkString(" | ")}")
  }

  test("producer push + connection test round-trip") {
    val dir = Files.createTempDirectory("graft-push").toString
    val rt = new QueueRuntime(spark, newQueue())
    rt.push(dir, "msg-1", "payload".getBytes("UTF-8"))
    assert(rt.testConnection(dir).startsWith("Connection successful"))
    val back = spark.read.schema(KinesisRecord.schema).parquet(dir).collect()
    assert(back.length == 1)
    assert(new String(back(0).getAs[Array[Byte]]("data"), "UTF-8")
      == "payload")
    assert(rt.testConnection("/nonexistent/path")
      .startsWith("Connection failed"))
  }

  test("config validation gates runtime construction") {
    intercept[IllegalArgumentException] {
      new QueueRuntime(spark, QueueConfig("", QueueConfig.StartFromOldest))
    }
  }
}
