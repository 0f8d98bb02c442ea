package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TextAnalysis
import graft.streaming.CmsStream

/** The streaming CMS audit must equal the batch `t_cms_portable` frame
  * over the union of everything ingested under any batch split, and the
  * merged per-batch sketches must equal the rebuilt-from-scratch sketch
  * ROW FOR ROW — the linearity that makes cross-batch/cross-engine
  * sketch merge a plain union+sum.
  */
class CmsStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def docs: DataFrame =
    Tables.spread(Tables.documents(spark, sf)).select("doc_id", "text")

  private def rows(df: DataFrame): Seq[(String, Long, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq

  private lazy val want =
    rows(SparkEntry.queries("t_cms_portable")(spark, sf))

  test("3-batch stream report equals the batch t_cms_portable frame " +
      "and replays idempotently") {
    val root = Files.createTempDirectory("cmsstream").toString
    val batches = (0 until 3).map(i =>
      docs.filter(col("doc_id") % 3 === i))
    batches.zipWithIndex.foreach { case (b, i) =>
      CmsStream.ingestBatch(b, i.toLong, root)
    }
    assert(rows(CmsStream.report(spark, root)) == want)
    // at-least-once replay: re-running batch 1 must change nothing
    CmsStream.ingestBatch(batches(1), 1L, root)
    assert(rows(CmsStream.report(spark, root)) == want)
  }

  test("merged per-batch sketches equal the rebuilt sketch row for row " +
      "(CMS linearity — the union+sum merge)") {
    val root = Files.createTempDirectory("cmslin").toString
    (0 until 4).foreach(i => CmsStream.ingestBatch(
      docs.filter(col("doc_id") % 4 === i), i.toLong, root))
    val merged = CmsStream.mergedSketch(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val wc = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val rebuilt = TextAnalysis.cmsSketchFrom(wc)
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1), r.getLong(2)))
      .toSet
    assert(merged == rebuilt)
    assert(merged.nonEmpty)
  }

  test("streaming wiring: the foreachBatch runner reaches the same " +
      "frame as direct ingestBatch calls") {
    val root = Files.createTempDirectory("cmswire").toString
    val src = s"$root/src"
    docs.select("text").write.mode("append").parquet(src)
    val stream = spark.readStream
      .schema(docs.select("text").schema).parquet(src)
    val q = CmsStream.start(stream, s"$root/state", s"$root/ckpt")
    try q.processAllAvailable() finally q.stop()
    assert(rows(CmsStream.report(spark, s"$root/state")) == want)
  }
}
