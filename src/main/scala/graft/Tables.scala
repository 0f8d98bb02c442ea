package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders (see FIXTURES.md). One place so every operator
  * reads the same way; parquet scans get Catalyst column pruning and
  * predicate pushdown for free.
  */
object Tables {
  /** Schema-inference cache, keyed by path (r17). `spark.read.parquet`
    * re-infers the schema on EVERY call — a footer-reading Spark job,
    * measured ~80 ms per read at any fixture size vs ~15 ms with an
    * explicit schema — and a registry sweep constructs hundreds of
    * frames per pass, each paying it again. A catalog-backed table
    * carries its schema in the metastore; this map is the same
    * metadata for path-based reads, held for the life of the JVM
    * (fixture files never change mid-run; METADATA only — every query
    * still computes its rows from the parquet). The one conf-sensitive
    * loader, [[events]], sets `nanosAsLong` before its first load, so
    * the cached schema is the one that conf produces.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val sch = schemaCache.computeIfAbsent(path,
      _ => spark.read.parquet(path).schema)
    spark.read.schema(sch).parquet(path)
  }

  /** `events` with `ts` normalized to a microsecond TimestampType,
    * whatever vintage the fixture is. Two vintages exist:
    *
    *  - TIMESTAMP(NANOS): Spark 4 rejects it by default; `nanosAsLong`
    *    (a SQL conf, not a reader option, hence session-wide — but only
    *    THIS loader sets it) surfaces it as a raw-nanos LongType, which
    *    we convert with integer `div` (not `/`) — nano epochs exceed
    *    2^53 so a double division would silently lose precision.
    *  - TIMESTAMP(MICROS): loads natively as Timestamp(NTZ); just cast
    *    to the session TimestampType, no arithmetic.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => df
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other (expected raw-nanos LONG or TIMESTAMP)")
    }
  }
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    load(s, d, "embeddings")

  /** Ensure CPU-heavy per-row work downstream sees at least one input
    * split per core — the small-file problem: a corpus slice that arrives
    * as one parquet file otherwise serializes the whole scan stage on one
    * task (measured: the sf0.1 shingle explode ran 3.3 s single-threaded
    * vs 0.7 s spread over 32). No-op when the input already has enough
    * splits, so at real scale (thousands of splits) this never shuffles.
    *
    * Applies only to SHUFFLE-FREE plans (scans/unions/projections): a
    * plan containing a join/aggregate/window re-parallelizes at its own
    * exchange, so spreading adds nothing — and probing `df.rdd` on such
    * a plan would make AQE materialize the upstream shuffle stages
    * eagerly, executing part of the query twice.
    */
  def spread(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val reShuffles = df.queryExecution.optimizedPlan.exists {
      case _: Join | _: Aggregate | _: Distinct | _: Window | _: Sort => true
      case _: RepartitionOperation => true
      case _ => false
    }
    if (reShuffles) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < target) df.repartition(target) else df
    }
  }
}
