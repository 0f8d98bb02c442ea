package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.QueueConfig
import graft.filters.{FilterSpec, FilterVerbs, PayloadFilter}
import graft.state.CheckpointStore
import graft.streaming._

/** Consume-path throughput measurement against the ONLY performance
  * facts the reference publishes (BASELINE.md): the Kinesis service
  * caps — 2 MB/s per shard (standard consumer, `README.md:207`) and
  * 2 MB/s per consumer per shard (EFO, `README.md:213`). The reference
  * cannot exceed those caps by construction (it is a poller of the
  * service); the question a switcher asks is whether THIS engine's
  * consume path — decode → single-parse JSON filter → per-shard ordered
  * dispatch → checkpoint — sustains them, i.e. whether the engine or
  * the service is the bottleneck. This main measures exactly that,
  * end-to-end through the real [[QueueRuntime]] streaming machinery
  * (not a stripped-down pipeline), for BOTH delivery sinks:
  *
  *  - [[QueueRuntime.HandlerDispatch]] (the reference's at-least-once
  *    per-record handler contract), and
  *  - [[ExactlyOnceDelivery]] (the versioned latest-wins upgrade,
  *    including its parquet write).
  *
  * `runMain graft.StreamThroughput [nRecords] [payloadBytes] [shards]`
  * (defaults 1 000 000 × ~1 KiB × 32). Prints one `STREAM_TPUT` JSON
  * line; `shards_serviceable` = measured MB/s ÷ the 2 MB/s shard cap —
  * how many saturated shards one node of this engine can drain.
  * Payload mix is 90% filter-pass / 10% filter-drop so both verdict
  * paths execute, plus the JSON parse every record pays.
  */
object StreamThroughput {
  private val seen = new AtomicLong(0)
  object CountingHandler extends MessageHandler {
    override def process(id: String, body: Array[Byte], text: String,
        key: String): Boolean = { seen.incrementAndGet(); true }
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val payloadBytes = args.lift(1).map(_.toInt).getOrElse(1024)
    val shards = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-stream-throughput")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ---- synthesize the stream (excluded from all timings) ----------
    // body ≈ payloadBytes of JSON: a real filterable field + padding.
    val dir = Files.createTempDirectory("tput-src").toString
    val pad = "x" * math.max(1, payloadBytes - 64)
    spark.range(n).select(
      concat(lit("""{"user":{"type":""""),
        when(pmod(col("id"), lit(10)) < 9, lit("admin"))
          .otherwise(lit("guest")),
        lit(""""},"n":"""), col("id"),
        lit(""","pad":""""), lit(pad), lit(""""}"""))
        .cast("binary").as("data"),
      format_string("shard-%02d", pmod(col("id"), lit(shards)))
        .as("partitionKey"),
      col("id").cast("string").as("sequenceNumber"),
      to_timestamp(lit("2026-01-01 00:00:00"))
        .as("approximateArrivalTimestamp"),
      lit("None").as("encryptionType"))
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(dir)
    val payloadMb = spark.read.parquet(dir)
      .agg(sum(length(col("data")))).head().getLong(0) / 1048576.0
    println(f"SYNTH $n records, $payloadMb%.1f MiB payload, $shards shards")

    val queue = QueueConfig("tputstream", QueueConfig.StartFromOldest,
      filters = FilterSpec(Seq(PayloadFilter("user.type",
        FilterVerbs.Equals, "admin"))))

    def timed(label: String)(run: QueueRuntime => Unit): Double = {
      // per-run counter: without the reset the exactly_once line prints
      // handler_seen still carrying run A's count (r13 ADVICE — the
      // JSON line was unaffected, but a misleading console row is a
      // misleading benchmark)
      seen.set(0)
      val rt = new QueueRuntime(spark, queue,
        new CheckpointStore(), s"tput-$label")
      val t0 = System.nanoTime()
      run(rt)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"TPUT $label%-14s $secs%7.2f s  ${payloadMb / secs}%8.1f MB/s" +
        f"  ${n / secs}%11.0f rec/s  delivered=${rt.deliveredCount}" +
        f" filtered=${rt.filteredCount} handler_seen=${seen.get()}")
      secs
    }

    // ---- A: the reference's contract (per-record handler dispatch) --
    val tHandler = timed("handler") { rt =>
      val ckpt = Files.createTempDirectory("tput-ckpt-a").toString
      val q = rt.start(new FileRecordSource(dir), CountingHandler, ckpt)
      q.processAllAvailable(); rt.stop()
    }

    // ---- B: the exactly-once table upgrade (incl. its parquet write) -
    val sinkRoot = Files.createTempDirectory("tput-sink").toString
    val tExact = timed("exactly_once") { rt =>
      val ckpt = Files.createTempDirectory("tput-ckpt-b").toString
      val q = rt.start(new FileRecordSource(dir),
        new ExactlyOnceDelivery(sinkRoot), ckpt)
      q.processAllAvailable(); rt.stop()
    }

    val mbsH = payloadMb / tHandler
    val mbsE = payloadMb / tExact
    println(f"""STREAM_TPUT {"metric":"stream_throughput","unit":"MB/s",""" +
      s""""records":$n,"payload_bytes":$payloadBytes,"shards":$shards,""" +
      f""""payload_mb":$payloadMb%.1f,"baseline_shard_mb_s":2.0,""" +
      f""""handler":{"secs":$tHandler%.2f,"mb_s":$mbsH%.1f,""" +
      f""""rec_s":${n / tHandler}%.0f,"shards_serviceable":${mbsH / 2.0}%.0f},""" +
      f""""exactly_once":{"secs":$tExact%.2f,"mb_s":$mbsE%.1f,""" +
      f""""rec_s":${n / tExact}%.0f,"shards_serviceable":${mbsE / 2.0}%.0f}}""")
    spark.stop()
  }
}
