package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QuantileSketch
import graft.streaming.QuantileStream

/** The streaming quantile view must equal the batch
  * `r_quantile_portable` frame over the union of everything ingested
  * under any batch split (bin-count additivity + shared code), replay
  * idempotently, and the merged per-batch sketches must equal the
  * rebuilt-from-scratch sketch row for row.
  */
class QuantileStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val Bin = 1000L

  private def kv: DataFrame =
    Tables.lineitem(spark, sf).select(
      col("l_returnflag").as("k"), col("l_extendedprice").as("v"),
      col("l_orderkey"))

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private lazy val want = rows(
    SparkEntry.queries("r_quantile_portable")(spark, sf)
      .withColumnRenamed("l_returnflag", "k"))

  test("3-batch stream view equals the batch frame and replays " +
      "idempotently") {
    val root = Files.createTempDirectory("qstream").toString
    val batches = (0 until 3).map(i =>
      kv.filter(col("l_orderkey") % 3 === i).select("k", "v"))
    batches.zipWithIndex.foreach { case (b, i) =>
      QuantileStream.ingestBatch(b, i.toLong, root, Bin)
    }
    val view = QuantileStream.quantileView(spark, root, Bin,
      Seq(50, 90, 99))
    assert(rows(view) == want)
    // at-least-once replay: re-running batch 2 must change nothing
    QuantileStream.ingestBatch(batches(2), 2L, root, Bin)
    assert(rows(QuantileStream.quantileView(spark, root, Bin,
      Seq(50, 90, 99))) == want)
  }

  test("merged per-batch sketches equal the rebuilt sketch row for row") {
    val root = Files.createTempDirectory("qlin").toString
    (0 until 4).foreach(i => QuantileStream.ingestBatch(
      kv.filter(col("l_orderkey") % 4 === i).select("k", "v"),
      i.toLong, root, Bin))
    val merged = rows(QuantileStream.mergedSketch(spark, root))
    val rebuilt = rows(QuantileSketch.sketch(
      kv, col("k"), col("v"), Bin))
    assert(merged == rebuilt)
    assert(merged.nonEmpty)
  }

  test("streaming wiring: the foreachBatch runner reaches the same " +
      "frame as direct ingestBatch calls") {
    val root = Files.createTempDirectory("qwire").toString
    val src = s"$root/src"
    kv.select("k", "v").write.mode("append").parquet(src)
    val stream = spark.readStream
      .schema(kv.select("k", "v").schema).parquet(src)
    val q = QuantileStream.start(stream, s"$root/state", s"$root/ckpt",
      Bin)
    try q.processAllAvailable() finally q.stop()
    assert(rows(QuantileStream.quantileView(spark, s"$root/state", Bin,
      Seq(50, 90, 99))) == want)
  }
}
