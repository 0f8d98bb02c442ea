package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Text-format ingest (JSONL / CSV) with the corrupt-record discipline
  * the filter core's P8 gate established: malformed lines are CAPTURED,
  * never silently dropped and never query-killing. Real pipelines land
  * crawls as JSONL long before anything is parquet; an engine that only
  * reads columnar files can't sit at the front of one.
  *
  * Both readers take an EXPLICIT schema: schema inference is a full
  * extra pass over 100 TB and makes the pipeline's types depend on
  * whichever slice was sampled. PERMISSIVE mode + a named corrupt
  * column routes bad lines to a quarantine the caller counts — the
  * batch twin of the streaming path's parse-failure pass-through.
  */
object TextSources {
  val CorruptCol = "_corrupt"

  /** JSONL with quarantine column. Spark requires the corrupt column
    * declared in the schema itself.
    */
  def readJsonl(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** CSV with header + quarantine column. */
  def readCsv(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)

  /** Streaming JSONL with the same quarantine column — the continuous
    * ingest front of the pipeline (a crawler drops JSONL files into a
    * landing dir; the stream picks each file up exactly once via file
    * tracking + checkpointing). Split with [[validStream]] /
    * [[quarantineStream]]: a stream can't be cached-and-counted, so
    * each side is its own filter over the one parse.
    */
  def readJsonlStream(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.readStream
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Valid rows of a permissive streaming read. */
  def validStream(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNull).drop(CorruptCol)

  /** Quarantined rows of a permissive streaming read: the raw line in
    * [[CorruptCol]] plus the (all-null) data columns. The data columns
    * are KEPT deliberately — projecting only the corrupt column would
    * prune the read schema down to it, the corner Spark hard-rejects
    * (`UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN`: a
    * PERMISSIVE parser that inspects no data columns marks nothing
    * corrupt). The batch path dodges this with its cache; a stream has
    * no cache, so the schema itself must stay wide.
    */
  def quarantineStream(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNotNull)

  /** A permissive read split into valid rows and quarantined raw
    * lines, with the handle that releases the one cache both sides
    * read from. `release()` the handle once both sides are consumed —
    * unpersisting the DERIVED frames would be a no-op (their
    * Filter(parsed) plans don't `sameResult` the cached plan, so the
    * CacheManager would remove nothing).
    */
  final case class PartitionedRead(valid: DataFrame,
      quarantine: DataFrame, parsed: DataFrame) {
    def release(): Unit = parsed.unpersist()
  }

  /** Split a permissive read into (valid rows, quarantined raw lines).
    *
    * The FULL-SCHEMA parse is materialized first — and that is the
    * semantic, not an implementation detail: under column pruning a
    * PERMISSIVE parser never inspects unreferenced columns, so a row
    * whose only defect sits in a pruned column would silently count as
    * valid (Spark hard-errors on the corrupt-only-projection corner of
    * this trap; the pruned-aggregate corner it cannot detect). A
    * quarantine decision is a statement about the WHOLE row, so the
    * whole row must parse. The cache bounds the cost to one parse for
    * both sides; long-lived sessions `release()` the handle after
    * consuming both sides ([[partition]] is the fire-and-forget form
    * whose cache lives until session end).
    */
  def partitionWithHandle(df: DataFrame): PartitionedRead = {
    val parsed = df.cache()
    parsed.count()
    PartitionedRead(
      parsed.filter(col(CorruptCol).isNull).drop(CorruptCol),
      parsed.filter(col(CorruptCol).isNotNull).select(col(CorruptCol)),
      parsed)
  }

  def partition(df: DataFrame): (DataFrame, DataFrame) = {
    val p = partitionWithHandle(df)
    (p.valid, p.quarantine)
  }
}
