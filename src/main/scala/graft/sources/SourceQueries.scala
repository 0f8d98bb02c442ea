package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-trip queries for the text-format readers: a parquet slice is
  * re-landed as JSONL / CSV (plus INJECTED garbage lines), read back
  * through [[TextSources]] with an explicit schema, and aggregated with
  * integer-only measures. The oracle aggregates the ORIGINAL parquet —
  * so a hash match proves both lossless field round-tripping and that
  * corrupt lines quarantined instead of poisoning or killing the read.
  * (Double round-trip fidelity is pinned separately in
  * TextSourcesSpec — floats stay out of the oracle on principle.)
  *
  * Each query materializes its (tiny, per-event-type) aggregate on the
  * driver, releases the parse cache, and deletes its temp directory
  * before returning: a bench loop re-runs every query 3-4× in one
  * session, and without the cleanup each run would pin an
  * InMemoryRelation and leak a corpus copy on disk for the session's
  * lifetime.
  */
object SourceQueries {
  type Q = (SparkSession, String) => DataFrame

  private def slice(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).filter(col("user_id") < 100)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))

  private def writeLines(dir: String, name: String,
      lines: Seq[String]): Unit = {
    val w = new java.io.PrintWriter(
      new java.io.File(dir, name), "UTF-8")
    try lines.foreach(w.println) finally w.close()
  }

  /** Aggregate, collect (≤ a handful of event-type rows), release the
    * parse cache, delete the landing dir, return a local frame.
    */
  private def aggAndClean(s: SparkSession, valid: DataFrame,
      release: () => Unit, dir: String): DataFrame = {
    import s.implicits._
    val rows = valid.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("event_id")).as("sum_event_id"),
        count_distinct(col("user_id")).as("n_users"))
      .orderBy("event_type")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    release()
    import scala.reflect.io.Directory
    new Directory(new java.io.File(dir)).deleteRecursively()
    rows.toDF("event_type", "n", "sum_event_id", "n_users")
  }

  val queries: Map[String, Q] = Map(
    "src_jsonl_roundtrip" -> { (s, d) =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft_jsonl").toString
      val sl = slice(s, d)
      sl.coalesce(4).write.mode("overwrite").json(dir)
      writeLines(dir, "garbage.txt",
        Seq("{not json", "\"scalar\"", "42"))
      val p = TextSources.partitionWithHandle(
        TextSources.readJsonl(s, dir, sl.schema))
      aggAndClean(s, p.valid, () => p.release(), dir)
    },
    "src_csv_roundtrip" -> { (s, d) =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft_csv").toString
      val sl = slice(s, d)
      sl.coalesce(4).write.mode("overwrite")
        .option("header", "true").csv(dir)
      // malformed rows ride a file with the proper HEADER line (a
      // header-less garbage file would have its first data line eaten
      // as a header): wrong types and wrong arity must both land in
      // quarantine, not in the aggregate
      writeLines(dir, "garbage.csv",
        Seq(sl.schema.fieldNames.mkString(","),
          "not_a_number,2,click,3.5",
          "1,2"))
      val p = TextSources.partitionWithHandle(
        TextSources.readCsv(s, dir, sl.schema))
      aggAndClean(s, p.valid, () => p.release(), dir)
    },
    // ORC round trip — the other columnar format Spark ships natively.
    // No quarantine tier (a corrupt ORC stripe is a storage fault, not
    // a data fault); the hash match proves lossless typed round-tripping
    // through the second columnar codec.
    "src_orc_roundtrip" -> { (s, d) =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft_orc").toString
      val sl = slice(s, d)
      sl.coalesce(4).write.mode("overwrite").orc(dir)
      aggAndClean(s, s.read.schema(sl.schema).orc(dir), () => (), dir)
    },
    // XML round trip — Spark 4's built-in XML source (the spark-xml
    // lineage, SPARK-44265). Explicit schema + rowTag, PERMISSIVE like
    // the JSONL/CSV tiers: a malformed-row file rides along and must
    // quarantine (null row), never poison the aggregate or kill the
    // read. The ingest shape for the feed/sitemap-style corpora a
    // crawl pipeline actually receives.
    "src_xml_roundtrip" -> { (s, d) =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft_xml").toString
      val sl = slice(s, d)
      // Schema-evolution tier: hold the min-event_id row OUT of the bulk
      // write and re-inject it as a hand-built v2 document carrying an
      // extra element the schema doesn't know (`crawl_meta`, the field a
      // crawler upgrade would add). The aggregate below can match the
      // oracle ONLY if that evolved row parses as a valid data row —
      // unknown elements must be ignored, not quarantine the row — so
      // evolution tolerance is hash-checked, not just asserted.
      val h = sl.orderBy("event_id").limit(1).collect()(0)
      sl.filter(col("event_id") =!= h.getLong(0))
        .coalesce(4).write.mode("overwrite")
        .option("rowTag", "event").xml(dir)
      val valueXml =
        if (h.isNullAt(3)) "" else s"<value>${h.getDouble(3)}</value>"
      writeLines(dir, "evolved.xml",
        Seq(s"<event><event_id>${h.getLong(0)}</event_id>" +
          s"<user_id>${h.getLong(1)}</user_id>" +
          s"<event_type>${h.getString(2)}</event_type>" + valueXml +
          "<crawl_meta schema=\"v2\"><depth>3</depth>" +
          "<fetched>2026-01-01</fetched></crawl_meta></event>"))
      writeLines(dir, "garbage.xml",
        Seq("<event><event_id>not_a_number</event_id>" +
          "<user_id>2</user_id><event_type>click</event_type>" +
          "<value>3.5</value></event>",
          "<event><unclosed></event"))
      val back = s.read.option("rowTag", "event")
        .option("mode", "PERMISSIVE").schema(sl.schema).xml(dir)
        .filter(col("event_id").isNotNull)
      aggAndClean(s, back, () => (), dir)
    })

  private val RoundtripSql =
    """SELECT event_type,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(event_id) AS BIGINT) AS sum_event_id,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM events WHERE user_id < 100
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  val oracles: Map[String, String] = Map(
    "src_jsonl_roundtrip" -> RoundtripSql,
    "src_csv_roundtrip" -> RoundtripSql,
    "src_orc_roundtrip" -> RoundtripSql,
    "src_xml_roundtrip" -> RoundtripSql)
}
