package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.config.QueueConfig
import graft.filters.{FilterSpec, FilterVerbs, PayloadFilter}
import graft.state.CheckpointStore
import graft.streaming._

/** Runnable end-to-end demo of the streaming runtime: produce → filter →
  * ordered dispatch → checkpoint → graceful stop. Usage:
  * `sbt "runMain graft.StreamDemo"`.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-stream-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = Files.createTempDirectory("graft-demo-stream").toString
    val ckpt = Files.createTempDirectory("graft-demo-ckpt").toString
    val store = new CheckpointStore()
    val queue = QueueConfig("demostream", QueueConfig.StartFromOldest,
      filters = FilterSpec(Seq(PayloadFilter("user.type",
        FilterVerbs.Equals + FilterVerbs.CaseInsensitiveSuffix, "ADMIN"))))
    val rt = new QueueRuntime(spark, queue, store, "demoq")

    // producer path (K1): 3 matching, 2 filtered, 1 malformed (pass-through)
    for (i <- 1 to 3)
      rt.push(dir, s"admin-$i",
        s"""{"user":{"type":"admin"},"n":$i}""".getBytes("UTF-8"))
    for (i <- 1 to 2)
      rt.push(dir, s"guest-$i",
        s"""{"user":{"type":"guest"},"n":$i}""".getBytes("UTF-8"))
    rt.push(dir, "broken", "{not-json".getBytes("UTF-8"))

    println("CONNTEST=" + rt.testConnection(dir))

    val q = rt.start(new FileRecordSource(dir), DemoHandler, ckpt)
    q.processAllAvailable()
    rt.stop()
    rt.stop() // idempotent

    println("DELIVERED=" + rt.deliveredCount)
    println("SEEN=" + DemoHandler.seen.toArray(Array.empty[String])
      .toSeq.sorted.mkString(" | "))
    println("CKPT_admin-2=" +
      store.getCheckpoint("demostream", "demoq", "admin-2"))
    spark.stop()
  }

  object DemoHandler extends MessageHandler {
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    override def process(id: String, body: Array[Byte], text: String,
        key: String): Boolean = { seen.add(s"$key:$id"); true }
  }
}
