package graft

import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TextSources

/** Streaming twin of the JSONL quarantine ingest: files landing in a
  * directory are picked up exactly once per file, valid rows flow to
  * the data sink, corrupt lines flow to the quarantine sink with their
  * raw text — across MULTIPLE micro-batches, with no line dropped and
  * no parse failure killing the query.
  */
class TextSourceStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  private val schema = new StructType()
    .add("id", LongType).add("name", StringType)

  test("landing-dir JSONL stream quarantines corrupt lines per batch") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_stream")
    def land(name: String, lines: String*): Unit = {
      // write-then-rename so the file source never reads a partial file
      val tmp = dir.resolve(name + ".tmp")
      val w = new java.io.PrintWriter(tmp.toFile, "UTF-8")
      try lines.foreach(w.println) finally w.close()
      java.nio.file.Files.move(tmp, dir.resolve(name))
    }
    land("a.json", """{"id": 1, "name": "a"}""", """{oops""")

    val parsed = TextSources.readJsonlStream(spark, dir.toString, schema)
    val valid = TextSources.validStream(parsed)
      .writeStream.format("memory").queryName("tss_valid")
      .outputMode("append").start()
    val bad = TextSources.quarantineStream(parsed)
      .writeStream.format("memory").queryName("tss_bad")
      .outputMode("append").start()
    try {
      valid.processAllAvailable(); bad.processAllAvailable()
      land("b.json", """{"id": 2, "name": "b"}""", """[3]""")
      valid.processAllAvailable(); bad.processAllAvailable()

      val got = spark.sql("SELECT id, name FROM tss_valid ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got == Seq((1L, "a"), (2L, "b")))
      val quarantined = spark.sql(
        s"SELECT ${TextSources.CorruptCol} FROM tss_bad")
        .collect().map(_.getString(0)).toSet
      assert(quarantined == Set("{oops", "[3]"),
        s"quarantine must keep raw lines across batches, got $quarantined")
    } finally { valid.stop(); bad.stop() }
  }
}
