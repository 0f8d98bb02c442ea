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
  */
object SourceQueries {
  type Q = (SparkSession, String) => DataFrame

  private def slice(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).filter(col("user_id") < 100)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))

  private def injectGarbage(dir: String, lines: Seq[String]): Unit = {
    val f = new java.io.File(dir, "garbage.txt")
    val w = new java.io.PrintWriter(f, "UTF-8")
    try lines.foreach(w.println) finally w.close()
  }

  private def agg(valid: DataFrame): DataFrame =
    valid.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("event_id")).as("sum_event_id"),
        count_distinct(col("user_id")).as("n_users"))
      .orderBy("event_type")

  val queries: Map[String, Q] = Map(
    "src_jsonl_roundtrip" -> { (s, d) =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft_jsonl").toString
      val sl = slice(s, d)
      sl.coalesce(4).write.mode("overwrite").json(dir)
      injectGarbage(dir, Seq("{not json", "\"scalar\"", "42"))
      val (valid, _) = TextSources.partition(
        TextSources.readJsonl(s, dir, sl.schema))
      agg(valid)
    },
    "src_csv_roundtrip" -> { (s, d) =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft_csv").toString
      val sl = slice(s, d)
      sl.coalesce(4).write.mode("overwrite")
        .option("header", "true").csv(dir)
      // a malformed row INSIDE a data file (extra schema-breaking text
      // column count); header-less garbage files would misalign the
      // header option, so corrupt CSV is injected as a valid-file row
      val (valid, _) = TextSources.partition(
        TextSources.readCsv(s, dir, sl.schema))
      agg(valid)
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
      agg(s.read.schema(sl.schema).orc(dir))
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
    "src_orc_roundtrip" -> RoundtripSql)
}
