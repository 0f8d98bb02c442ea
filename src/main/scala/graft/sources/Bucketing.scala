package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table ingest — the zero-shuffle join path for the engine's
  * fact-to-fact joins at scale (SCALING.md: "bucket both tables by
  * orderkey at ingest and the Exchange disappears").
  *
  * Spark's bucketing co-locates rows by `hash(key) % buckets` at WRITE
  * time and records the layout in the catalog; a join of two tables
  * bucketed on the join key with the same bucket count then satisfies
  * both sides' distribution requirements and plans WITHOUT a shuffle
  * Exchange. At 100 TB this converts every recurring orderkey join from
  * a full-fact-table shuffle into a local merge per bucket.
  */
object Bucketing {
  /** Write `df` as a bucketed (and bucket-sorted) managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Co-located equi-join of two tables previously written with
    * [[writeBucketed]] on their join keys (same bucket count).
    */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame = {
    // build the condition from the SAME DataFrame instances being joined
    // — fresh spark.table() calls only resolved via a catalog-cache
    // identity accident, and broke bucketed SELF-joins outright
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
