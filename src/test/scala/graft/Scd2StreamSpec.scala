package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Scd2Stream

/** The SCD2 stream's contract: ingesting the batch operator's three
  * synthetic versions one at a time produces the identical history
  * table, replays are idempotent, and a doc returning after a gap with
  * unchanged content extends its old run across the gap.
  */
class Scd2StreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def docs(): DataFrame =
    Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")

  // the registered query's synthetic versions, verbatim
  private def v0 = docs()
  private def v1 = docs().select(col("doc_id"),
    when(col("doc_id") % 7 === 0, concat(col("text"), lit(" edit1")))
      .otherwise(col("text")).as("text"))
  private def v2 = {
    val e1 = when(col("doc_id") % 7 === 0,
      concat(col("text"), lit(" edit1"))).otherwise(col("text"))
    docs().filter(col("doc_id") % 17 =!= 2)
      .select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(e1, lit(" edit2")))
          .otherwise(e1).as("text"))
  }

  private def collectHist(df: DataFrame) = df.collect()
    .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("content_md5"),
      r.getAs[Int]("valid_from"), r.getAs[Int]("valid_to"),
      r.getAs[Boolean]("is_current"))).toSet

  test("three ingested versions equal the batch operator's history") {
    val out = tmp("scd_out")
    Scd2Stream.ingestVersion(v0, 0, out)
    Scd2Stream.ingestVersion(v1, 1, out)
    Scd2Stream.ingestVersion(v2, 2, out)
    val got = collectHist(Scd2Stream.history(spark, out, 2))
    val want = collectHist(SparkEntry.queries("p_scd2_history")(spark,
      "/root/testdata/sf0.001"))
    assert(got == want)
  }

  test("replaying the last version is idempotent") {
    val out = tmp("scd_out2")
    Scd2Stream.ingestVersion(v0, 0, out)
    Scd2Stream.ingestVersion(v1, 1, out)
    Scd2Stream.ingestVersion(v2, 2, out)
    val before = collectHist(Scd2Stream.history(spark, out, 2))
    Scd2Stream.ingestVersion(v2, 2, out)
    assert(collectHist(Scd2Stream.history(spark, out, 2)) == before)
  }

  test("a doc returning after a gap with unchanged content extends its run") {
    val out = tmp("scd_out3")
    val d = Seq((1L, "stable text"), (2L, "other text")).toDF("doc_id", "text")
    Scd2Stream.ingestVersion(d, 0, out)
    Scd2Stream.ingestVersion(d.filter(col("doc_id") === 2L), 1, out)
    Scd2Stream.ingestVersion(d, 2, out) // doc 1 returns, same content
    val got = collectHist(Scd2Stream.history(spark, out, 2))
      .map(t => (t._1, t._3, t._4, t._5))
    assert(got.contains((1L, 0, 2, true)), s"run must span the gap: $got")
    assert(got.contains((2L, 0, 2, true)))
  }
}
