package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TextSources

/** Text-source discipline the round-trip oracle can't see directly:
  * corrupt lines land in quarantine with their raw text (not dropped,
  * not fatal), schema-missing fields become nulls, and doubles survive
  * a JSONL round trip bit-exactly.
  */
class TextSourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val schema = new StructType()
    .add("id", LongType).add("name", StringType).add("x", DoubleType)

  test("JSONL: corrupt lines quarantine with raw text; valid rows parse;" +
      " missing fields are null") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    val w = new java.io.PrintWriter(s"$dir/part.json", "UTF-8")
    w.println("""{"id": 1, "name": "a", "x": 1.5}""")
    w.println("""{"id": 2}""")             // missing fields → nulls
    w.println("""{broken""")               // corrupt → quarantine
    w.println("""[1, 2]""")                // non-object → quarantine
    w.close()
    val (validDf, corruptDf) =
      TextSources.partition(TextSources.readJsonl(spark, dir, schema))
    val ok = validDf.orderBy("id").collect()
    assert(ok.length == 2)
    assert(ok(0).getLong(0) == 1L && ok(0).getString(1) == "a" &&
      ok(0).getDouble(2) == 1.5)
    assert(ok(1).getLong(0) == 2L && ok(1).isNullAt(1) && ok(1).isNullAt(2))
    val bad = corruptDf.collect().map(_.getString(0)).toSet
    assert(bad == Set("{broken", "[1, 2]"),
      s"quarantine must keep raw lines, got $bad")
  }

  test("CSV: wrong-arity rows quarantine; valid rows type-cast") {
    val dir = java.nio.file.Files.createTempDirectory("csv").toString
    val w = new java.io.PrintWriter(s"$dir/part.csv", "UTF-8")
    w.println("id,name,x")
    w.println("1,a,1.5")
    w.println("2,b,not_a_number")          // bad double → quarantine
    w.close()
    val (validDf, corruptDf) =
      TextSources.partition(TextSources.readCsv(spark, dir, schema))
    assert(validDf.count() == 1)
    assert(corruptDf.count() == 1)
  }

  test("XML: typed round trip; malformed and mistyped rows null out " +
      "instead of poisoning the read") {
    val dir = java.nio.file.Files.createTempDirectory("xml_rt").toString
    val src = Seq((1L, "a", 2.5), (2L, "b", 3.5)).toDF("id", "name", "x")
    src.coalesce(1).write.mode("overwrite")
      .option("rowTag", "row").xml(dir)
    val w = new java.io.PrintWriter(
      new java.io.File(dir, "garbage.xml"), "UTF-8")
    try {
      w.println("<row><id>not_a_number</id><name>c</name><x>1.0</x></row>")
      w.println("<row><unclosed></row")
    } finally w.close()
    val back = spark.read.option("rowTag", "row")
      .option("mode", "PERMISSIVE").schema(src.schema).xml(dir)
    // mistyped long → null id (the quarantine key the round-trip query
    // filters on); both source rows survive typed
    assert(back.filter($"id".isNull).count() >= 1)
    val ok = back.filter($"id".isNotNull).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(ok.toSeq == Seq((1L, "a", 2.5), (2L, "b", 3.5)))
  }

  test("doubles round-trip JSONL bit-exactly") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_rt").toString
    val vals = Seq(0.1, 1.0 / 3.0, math.Pi, 1e-300, 1.7976931348623157e308,
      -0.0, 4.9e-324)
    val src = vals.zipWithIndex.map { case (v, i) => (i.toLong, "n", v) }
      .toDF("id", "name", "x")
    src.coalesce(1).write.mode("overwrite").json(dir)
    val back = TextSources.partition(
      TextSources.readJsonl(spark, dir, schema))._1
      .orderBy("id").collect().map(_.getDouble(2))
    val want = vals.toArray
    assert(back.length == want.length)
    back.zip(want).foreach { case (b, w) =>
      assert(java.lang.Double.doubleToRawLongBits(b) ==
        java.lang.Double.doubleToRawLongBits(w),
        s"double $w did not round-trip bit-exactly (got $b)")
    }
  }
}
