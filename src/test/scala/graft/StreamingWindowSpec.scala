package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.KinesisRecord
import graft.streaming.WindowedStreams

/** Streaming watermark semantics (ST14 + streaming ST8): windowed counts
  * under `readStream` agree with the batch formulation, and
  * `dropDuplicatesWithinWatermark` suppresses redelivered sequence numbers
  * with bounded state.
  */
class StreamingWindowSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  private def rec(key: String, seq: String, epochSec: Long): KinesisRecord =
    KinesisRecord(seq.getBytes("UTF-8"), key, seq,
      new Timestamp(epochSec * 1000), "None")

  private def writeRecords(dir: String, recs: Seq[KinesisRecord]): Unit = {
    import spark.implicits._
    recs.toDS().write.mode("append").parquet(dir)
  }

  test("streaming tumbling counts equal the batch formulation") {
    val dir = Files.createTempDirectory("wstream").toString
    val base = 1700000000L // window-aligned enough for 10-minute buckets
    val recs = (0 until 120).map { i =>
      rec(s"k${i % 3}", i.toString, base + i * 30) // 30s apart, 3 keys
    }
    writeRecords(dir, recs)

    import spark.implicits._
    val stream = spark.readStream.schema(KinesisRecord.schema).parquet(dir)
    val q = WindowedStreams.tumblingCounts(stream, "10 minutes", "1 minute")
      .writeStream.outputMode("complete")
      .format("memory").queryName("wcounts").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("wcounts")
      .select(col("window_start"), col("partitionKey"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    val batch = spark.read.schema(KinesisRecord.schema).parquet(dir)
      .groupBy(window(col("approximateArrivalTimestamp"), "10 minutes")
        .as("w"), col("partitionKey"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start"), col("partitionKey"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("dropDuplicatesWithinWatermark suppresses redelivery in-horizon") {
    val dir = Files.createTempDirectory("wdedup").toString
    val base = 1700000000L
    // sequences 0..19, each delivered twice within the horizon
    val once = (0 until 20).map(i => rec("k", i.toString, base + i * 10))
    writeRecords(dir, once ++ once)

    val stream = spark.readStream.schema(KinesisRecord.schema).parquet(dir)
    val q = WindowedStreams.dedupWithinWatermark(stream, "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("wdedup").start()
    try q.processAllAvailable() finally q.stop()

    val seqs = spark.table("wdedup").select("sequenceNumber")
      .collect().map(_.getString(0))
    assert(seqs.length == 20, s"expected 20 unique, got ${seqs.length}")
    assert(seqs.toSet == (0 until 20).map(_.toString).toSet)
  }
}
