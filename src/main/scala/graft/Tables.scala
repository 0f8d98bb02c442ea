package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders (see FIXTURES.md). One place so every operator
  * reads the same way; parquet scans get Catalyst column pruning and
  * predicate pushdown for free.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which Spark 4 rejects by
    // default; read nanos as long and convert explicitly (see events()).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** `events` with `ts` converted from raw nanos to a microsecond
    * TimestampType. Integer `div` (not `/`) — nano epochs exceed 2^53 so a
    * double division would silently lose precision.
    */
  def events(s: SparkSession, d: String): DataFrame =
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions
        .expr("timestamp_micros(ts div 1000)"))
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
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
