package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Hive-style partitioned parquet layout — the file-skipping path for the
  * engine's selective scans at scale.
  *
  * `partitionBy` at write time encodes the partition columns into the
  * directory tree (`lang=en/part-…`); a query filtering on those columns
  * then prunes whole directories at PLANNING time — the scan's
  * `PartitionFilters` — so a `lang = 'en'` predicate over a 100 TB corpus
  * reads only the English files, no matter how many others exist. This is
  * the coarse-grained complement to parquet row-group pushdown
  * (`PushedFilters`): pruning removes files from the listing; pushdown
  * skips row groups inside the files that remain.
  *
  * Partition columns must be low-cardinality (language, ingest date,
  * source): a high-cardinality partition key explodes the file count and
  * kills the listing. Cardinality guidance lives with the caller; the
  * writer optionally repartitions by the partition columns first so each
  * partition directory gets one file per shuffle partition instead of one
  * per input task (the small-files problem at ingest).
  */
object PartitionedLayout {
  /** Write `df` partitioned by `cols`. `coalesceOutput` pre-shuffles on
    * (partition columns, content-hash salt) so each directory holds
    * about `filesPerDir` files — at 100 TB the difference between
    * O(dirs) and O(dirs × input-tasks) files. The salt matters as much
    * as the shuffle: repartitioning on the partition columns ALONE
    * routes every row of a partition value through ONE task — a
    * write-skew straggler serializing `lang=en` through a single
    * thread. The salt is a deterministic hash of the whole row (no
    * rand(): task retries must land rows in the same shuffle
    * partition), spreading each directory across `filesPerDir` writers.
    */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String],
      coalesceOutput: Boolean = true, filesPerDir: Int = 4): Unit = {
    require(filesPerDir >= 1,
      s"filesPerDir must be >= 1, got $filesPerDir") // pmod-by-0 salt
    import org.apache.spark.sql.functions._
    val out =
      if (coalesceOutput) {
        val salt = pmod(xxhash64(struct(df.columns.toSeq.map(col): _*)),
          lit(filesPerDir.toLong))
        df.repartition(cols.map(col) :+ salt: _*)
      } else df
    out.write
      .mode(SaveMode.Overwrite)
      .partitionBy(cols: _*)
      .parquet(path)
  }

  /** Read a layout produced by [[writePartitioned]]. Partition columns
    * come back from the directory names; filters on them become
    * `PartitionFilters` in the scan.
    *
    * `mergeSchema = true` unions the footers of every file instead of
    * trusting the first one — the schema-EVOLUTION read: a crawl layout
    * whose later batches grew columns (a new quality signal, a new
    * media field) comes back as the superset schema with nulls for
    * files that predate a column. Off by default because footer
    * merging costs a pass over every file's metadata at planning time;
    * at 100 TB, prefer a table catalog carrying the current schema and
    * turn this on only for ad-hoc reads of evolving layouts.
    */
  def readPartitioned(spark: SparkSession, path: String,
      mergeSchema: Boolean = false): DataFrame =
    spark.read
      .option("mergeSchema", mergeSchema.toString)
      .parquet(path)
}
