package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query subset for fast local loops
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // same workload-sized codegen class cache as Bench (the default
      // LRU-100 evicts everything across a 258-query sweep)
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8192"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // query -> exception head for every throwing query, dumped as
    // verify_errors.json so a broken query shows up as first-class data in
    // the round's correctness signal instead of silently vanishing from
    // the comparator's output (its parquet dir is deleted below).
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val head = Option(e.getMessage).getOrElse(e.getClass.getName)
          .linesIterator.next()
        System.err.println(s"[verify] $name failed: $head")
        errors(name) = s"${e.getClass.getSimpleName}: $head"
        // a previous run's output for this query must NOT survive: the
        // driver's compare would read the stale parquet as current and
        // report a broken query as passing
        val dir = new java.io.File(s"$outDir/$name")
        if (dir.exists()) {
          import scala.reflect.io.Directory
          new Directory(dir).deleteRecursively()
        }
      }
      // some builders persist() shared frames; drop them so cache memory
      // stays bounded by one query, not the whole 200+-query sweep
      finally { try spark.catalog.clearCache()
        catch { case _: Throwable => () } }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_errors.json"), errJson)
    // every intentionally-oracle-less query, with its oracle-green
    // sibling and the reason — so the comparator side can tell an
    // annotated scale-path tier from an unexplained coverage hole
    // (CoverageTotalsSpec enforces the same contract at build time)
    val noOracleJson = SparkEntry.noOracle
      .map { case (k, (sib, why)) =>
        s"${q(k)}: {${q("supersededBy")}: ${q(sib)}, " +
          s"${q("why")}: ${q(why)}}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/no_oracle.json"), noOracleJson)
    spark.stop()
  }
}
