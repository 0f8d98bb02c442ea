package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PartitionedLayout

/** Partitioned layout: a filter on the partition column must prune at
  * planning time (PartitionFilters on the scan, only the matching
  * directory's files read) and return exactly the rows of the equivalent
  * unpartitioned filter.
  */
class PartitionedLayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  test("lang filter becomes a PartitionFilter and reads one directory") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_part").toString + "/docs"
    val docs = Tables.documents(spark, sf)
    PartitionedLayout.writePartitioned(docs, path, Seq("lang"))

    val back = PartitionedLayout.readPartitioned(spark, path)
    val en = back.filter(col("lang") === "en")
      .select("doc_id", "lang")
    val plan = en.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.replaceAll("#\\d+", "")
      .contains("(lang = en)"), plan)
    // the pruned scan touches files from ONE directory only
    val files = en.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("lang=en")), files.toSeq)

    // row fidelity vs the unpartitioned table
    val got = en.select("doc_id").collect().map(_.getLong(0)).toSet
    val expect = docs.filter(col("lang") === "en")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expect && got.nonEmpty)
    // non-vacuous: other languages exist and were pruned away
    assert(docs.select("lang").distinct().count() > 1)
  }

  test("schema evolution: a later batch's new column merges with nulls") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_evolve").toString + "/docs"
    val docs = Tables.documents(spark, sf)
    // batch 1: original schema
    PartitionedLayout.writePartitioned(
      docs.filter(col("doc_id") < 100).select("doc_id", "text", "lang"),
      path, Seq("lang"))
    // batch 2 grew a quality column — append alongside batch 1
    docs.filter(col("doc_id") >= 100)
      .select(col("doc_id"), col("text"), col("lang"),
        graft.pipeline.TextAnalysis.round4HalfUp(
          graft.pipeline.TextAnalysis.qualityScore(col("text")))
          .as("quality"))
      .repartition(col("lang"))
      .write.mode("append").partitionBy("lang").parquet(path)

    val merged = PartitionedLayout.readPartitioned(spark, path,
      mergeSchema = true)
    assert(merged.columns.contains("quality"), merged.columns.toSeq)
    val n = docs.count()
    assert(merged.count() == n)
    // pre-evolution rows surface the new column as null; new rows don't
    assert(merged.filter(col("doc_id") < 100)
      .filter(col("quality").isNotNull).count() == 0)
    assert(merged.filter(col("doc_id") >= 100)
      .filter(col("quality").isNull).count() == 0)
  }

  test("coalesced write keeps files-per-directory independent of input tasks") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_part2").toString + "/docs"
    // force many input partitions; the writer's pre-shuffle must still
    // produce a handful of files per lang directory, not one per task
    val docs = Tables.documents(spark, sf).repartition(32)
    PartitionedLayout.writePartitioned(docs, path, Seq("lang"))
    val langs = Tables.documents(spark, sf)
      .select("lang").distinct().count()
    val files = PartitionedLayout.readPartitioned(spark, path)
      .select(input_file_name()).distinct().count()
    // shuffle.partitions=4 in tests ⇒ ≤4 files per directory; without the
    // pre-shuffle this would be up to 32 per directory
    assert(files <= langs * 4, s"$files files for $langs dirs")
  }
}
