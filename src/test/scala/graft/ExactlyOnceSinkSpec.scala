package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.ExactlyOnceSink

/** The exactly-once merge sink: crash-replay at EVERY point of the
  * commit protocol must produce the identical observable table —
  * uncommitted versions are invisible, redelivered batches are
  * no-ops, and the streamed result equals the batch latest-wins
  * aggregation over the fixture corpus.
  */
class ExactlyOnceSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def rows(df: DataFrame): Map[String, (String, Long)] =
    df.collect().map(r => r.getString(0) ->
      ((r.getString(1), r.getLong(2)))).toMap

  private def kvs(t: (String, String, Long)*): DataFrame =
    t.toDF("k", "v", "seq")

  test("merge folds batches; redelivery changes nothing observable") {
    val root = Files.createTempDirectory("xsink").toString
    ExactlyOnceSink.applyBatch(
      kvs(("1", "a", 10L), ("2", "b", 11L)), 0L, root)
    ExactlyOnceSink.applyBatch(
      kvs(("1", "c", 20L), ("3", "d", 21L)), 1L, root)
    val want = Map("1" -> ("c", 20L), "2" -> ("b", 11L), "3" -> ("d", 21L))
    assert(rows(ExactlyOnceSink.table(spark, root)) == want)
    val vBefore = ExactlyOnceSink.latestCommitted(spark, root)
    // at-least-once redelivery of batch 1 (and a stale batch 0): the
    // fence makes both no-ops — same table, same version, no write
    ExactlyOnceSink.applyBatch(kvs(("1", "c", 20L), ("3", "d", 21L)), 1L, root)
    ExactlyOnceSink.applyBatch(kvs(("1", "a", 10L)), 0L, root)
    assert(rows(ExactlyOnceSink.table(spark, root)) == want)
    assert(ExactlyOnceSink.latestCommitted(spark, root) == vBefore)
  }

  test("crash between data write and commit marker is invisible") {
    val root = Files.createTempDirectory("xsinkcrash").toString
    ExactlyOnceSink.applyBatch(kvs(("1", "a", 10L)), 0L, root)
    val want0 = rows(ExactlyOnceSink.table(spark, root))
    // manufacture the crash: batch 1's data lands in v=2/data but the
    // writer dies before the marker — readers must still see v=1
    kvs(("1", "z", 99L), ("7", "y", 98L)).write.mode("overwrite")
      .parquet(s"$root/v=2/data")
    assert(rows(ExactlyOnceSink.table(spark, root)) == want0,
      "uncommitted version leaked into reads")
    assert(ExactlyOnceSink.latestCommitted(spark, root)._2 == 0L)
    // the stream redelivers batch 1 (id 1 > fence 0): the replay
    // overwrites the orphan dir and commits — exactly-once converges
    ExactlyOnceSink.applyBatch(kvs(("1", "z", 99L), ("7", "y", 98L)), 1L, root)
    assert(rows(ExactlyOnceSink.table(spark, root)) ==
      Map("1" -> ("z", 99L), "7" -> ("y", 98L)))
  }

  test("crash mid-marker write: tmp-only and corrupt markers read as " +
      "uncommitted; replay converges instead of bricking the sink") {
    val root = Files.createTempDirectory("xsinkmid").toString
    ExactlyOnceSink.applyBatch(kvs(("1", "a", 10L)), 0L, root)
    val want0 = rows(ExactlyOnceSink.table(spark, root))
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // crash point 1: the writer died after writing v=2/data and the
    // _commit.tmp but BEFORE the rename — no _commit exists, so v=2
    // must stay invisible
    kvs(("1", "z", 99L)).write.mode("overwrite").parquet(s"$root/v=2/data")
    val tmp = new org.apache.hadoop.fs.Path(s"$root/v=2/_commit.tmp")
    val o1 = fs.create(tmp, true); o1.writeBytes("1\n"); o1.close()
    assert(rows(ExactlyOnceSink.table(spark, root)) == want0)
    assert(ExactlyOnceSink.latestCommitted(spark, root) == (1L, 0L))
    // crash point 2 (defense in depth — rename makes this unreachable,
    // but a corrupt marker must read as uncommitted, never throw on
    // every subsequent call): an EMPTY _commit at v=2
    val o2 = fs.create(
      new org.apache.hadoop.fs.Path(s"$root/v=2/_commit"), true)
    o2.close()
    assert(rows(ExactlyOnceSink.table(spark, root)) == want0,
      "corrupt marker leaked an uncommitted version into reads")
    assert(ExactlyOnceSink.latestCommitted(spark, root) == (1L, 0L))
    // the redelivery (id 1 > fence 0) overwrites the orphan version
    // and commits atomically — the protocol converges
    ExactlyOnceSink.applyBatch(kvs(("1", "z", 99L)), 1L, root)
    assert(rows(ExactlyOnceSink.table(spark, root)) ==
      Map("1" -> ("z", 99L)))
    assert(ExactlyOnceSink.latestCommitted(spark, root) == (2L, 1L))
  }

  test("crash after commit but before stream checkpoint: replay no-ops") {
    val root = Files.createTempDirectory("xsinkpost").toString
    ExactlyOnceSink.applyBatch(kvs(("1", "a", 10L)), 0L, root)
    ExactlyOnceSink.applyBatch(kvs(("1", "b", 20L)), 1L, root)
    val want = rows(ExactlyOnceSink.table(spark, root))
    val v = ExactlyOnceSink.latestCommitted(spark, root)
    // the sink committed batch 1 but the stream checkpoint didn't —
    // on restart foreachBatch re-runs batch 1; the fence absorbs it
    ExactlyOnceSink.applyBatch(kvs(("1", "b", 20L)), 1L, root)
    assert(rows(ExactlyOnceSink.table(spark, root)) == want)
    assert(ExactlyOnceSink.latestCommitted(spark, root) == v)
  }

  test("vacuum keeps only the newest committed version; table unchanged") {
    val root = Files.createTempDirectory("xsinkvac").toString
    (0 to 3).foreach(i => ExactlyOnceSink.applyBatch(
      kvs((i.toString, s"v$i", i * 10L)), i.toLong, root))
    val want = rows(ExactlyOnceSink.table(spark, root))
    ExactlyOnceSink.vacuum(spark, root)
    assert(rows(ExactlyOnceSink.table(spark, root)) == want)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName).filter(_.startsWith("v=")).toSet
    assert(dirs == Set("v=4"), s"got $dirs")
  }

  test("streaming wiring equals the batch latest-wins aggregation") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val want = rows(events.groupBy(col("user_id").cast("string").as("k"))
      .agg(max_by(col("event_type"), col("event_id")).as("v"),
        max(col("event_id")).as("seq")))
    val root = Files.createTempDirectory("xsinkwire").toString
    val src = s"$root/src"
    events.write.mode("append").parquet(src)
    val stream = spark.readStream.schema(
      spark.read.parquet(src).schema).parquet(src)
    val q = ExactlyOnceSink.start(stream, s"$root/sink", s"$root/ckpt")
    try q.processAllAvailable() finally q.stop()
    assert(rows(ExactlyOnceSink.table(spark, s"$root/sink")) == want)
  }
}
