package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.model.KinesisRecord
import graft.streaming.{JsonRecordSource, StatefulSessions}

/** Custom-state sessionization (flatMapGroupsWithState) + the JSON-lines
  * record source.
  */
class StatefulSessionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  private def rec(key: String, seq: Long, epochSec: Long): KinesisRecord =
    KinesisRecord(seq.toString.getBytes("UTF-8"), key, seq.toString,
      new Timestamp(epochSec * 1000), "None")

  test("flatMapGroupsWithState closes sessions on gap, keeps the open one") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sess").toString
    val base = 1700000000L
    // key a: 3 events close together, a 1-hour gap, then 2 more
    //   → first session (n=3) closes when the post-gap event arrives;
    //     second session stays OPEN in state (no later event closes it)
    // key b: single burst → stays open, nothing emitted
    val recs = Seq(
      rec("a", 1, base), rec("a", 2, base + 60), rec("a", 3, base + 120),
      rec("a", 4, base + 3720), rec("a", 5, base + 3780),
      rec("b", 6, base), rec("b", 7, base + 30))
    recs.toDS().write.mode("overwrite").parquet(dir)

    val ds = spark.readStream.schema(KinesisRecord.schema).parquet(dir)
      .as[KinesisRecord]
    val q = StatefulSessions.sessionize(ds, gapMillis = 600000L, spark,
        idleTimeout = false)
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions").start()
    try q.processAllAvailable() finally q.stop()

    val closed = spark.table("sessions")
      .collect().map(r => (r.getString(0), r.getLong(3))).toSeq
    // only key a's FIRST session closed (by the post-gap record);
    // open sessions await the processing-time timeout
    assert(closed == Seq(("a", 3L)))
  }

  test("transformWithState sessionization agrees with the v1 operator") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sessv2").toString
    val base = 1700000000L
    val recs = Seq(
      rec("a", 1, base), rec("a", 2, base + 60), rec("a", 3, base + 120),
      rec("a", 4, base + 3720), rec("a", 5, base + 3780),
      rec("b", 6, base), rec("b", 7, base + 30),
      rec("b", 8, base + 4000)) // closes b's first session (n=2)
    recs.toDS().write.mode("overwrite").parquet(dir)

    // transformWithState requires the RocksDB state-store provider
    val saved = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val ds = spark.readStream.schema(KinesisRecord.schema).parquet(dir)
        .as[KinesisRecord]
      val q = graft.streaming.StatefulSessionsV2
        .sessionize(ds, gapMillis = 600000L, spark, timers = false)
        .writeStream.outputMode("append").format("memory")
        .queryName("sessions_v2").start()
      try q.processAllAvailable() finally q.stop()
      val v2 = spark.table("sessions_v2")
        .collect().map(r => (r.getString(0), r.getLong(3))).toSet
      // same gap semantics as v1: a's first burst (3) and b's first
      // burst (2) close; the post-gap singletons stay open in state
      assert(v2 == Set(("a", 3L), ("b", 2L)))
    } finally saved match {
      case Some(v) => spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset(
        "spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("JSON-lines source round-trips the envelope") {
    import spark.implicits._
    val dir = Files.createTempDirectory("jsonsrc").toString
    val recs = Seq(rec("k1", 1, 1700000000L), rec("k2", 2, 1700000100L))
    recs.toDS().write.mode("overwrite").json(dir) // one JSON object per line
    val q = new JsonRecordSource(dir).stream(spark)
      .writeStream.outputMode("append").format("memory")
      .queryName("jsonsrc").start()
    try q.processAllAvailable() finally q.stop()
    val back = spark.table("jsonsrc").collect()
    assert(back.length == 2)
    val keys = back.map(_.getAs[String]("partitionKey")).toSet
    assert(keys == Set("k1", "k2"))
    val bodies = back.map(r =>
      new String(r.getAs[Array[Byte]]("data"), "UTF-8")).toSet
    assert(bodies == Set("1", "2")) // binary survives the base64 round-trip
  }
}
