package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.DetDraw

/** The deterministic-draw idiom's null contract (r14 ADVICE): a null
  * part must null the whole key — and therefore hash/draw/gate — so a
  * corrupt row FALLS OUT of samplers instead of drawing from a
  * truncated key, matching the SQL twins whose `||` chain
  * null-propagates natively (concat_ws alone silently skips nulls).
  */
class DetDrawSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  test("non-null parts: key is the ':'-joined string form and the " +
      "draw/gate derive from its md5") {
    import spark.implicits._
    val df = Seq((7L, "fim1")).toDF("id", "tag")
    val row = df.select(
      DetDraw.key(col("id"), col("tag")).as("k"),
      DetDraw.hash(col("id"), col("tag")).as("h"),
      md5(lit("7:fim1")).as("expect_h"),
      DetDraw.draw(4, col("id"), col("tag")).as("d"),
      DetDraw.keepGate(col("id"), col("tag")).as("g")).head()
    assert(row.getString(0) == "7:fim1")
    assert(row.getString(1) == row.getString(2))
    val expectDraw = java.lang.Long.parseLong(row.getString(2).take(4), 16)
    assert(row.getLong(3) == expectDraw)
    assert(row.getBoolean(4) == (row.getString(2).head != '0'))
  }

  test("a null part nulls key, hash, and draw, and the gate drops the " +
      "row from a filter — the SQL-twin semantics") {
    import spark.implicits._
    val df = Seq((Some(1L), "a"), (None, "b")).toDF("id", "tag")
    val out = df.select(col("tag"),
      DetDraw.key(col("id"), col("tag")).as("k"),
      DetDraw.hash(col("id"), col("tag")).as("h"),
      DetDraw.draw(4, col("id"), col("tag")).as("d"))
      .orderBy("tag").collect()
    assert(!out(0).isNullAt(1) && !out(0).isNullAt(2) && !out(0).isNullAt(3))
    assert(out(1).isNullAt(1) && out(1).isNullAt(2) && out(1).isNullAt(3))
    // the keep gate evaluates to null on the corrupt row, and a filter
    // drops null — the row cannot be sampled
    val kept = df.filter(DetDraw.keepGate(col("id"), col("tag")))
      .select("tag").collect().map(_.getString(0)).toSet
    assert(!kept.contains("b"))
  }
}
