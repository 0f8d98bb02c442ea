package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Bucketing

/** Bucketed co-located join: same answer as the plain join, and the
  * physical plan must contain NO shuffle Exchange between the bucketed
  * scans and the join.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  test("bucketed join has no Exchange and matches the plain join") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderpriority")
    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
    Bucketing.writeBucketed(ord, "ord_bucketed", "o_orderkey", 8)

    val joined = Bucketing.colocatedJoin(spark, "li_bucketed",
      "ord_bucketed", "l_orderkey", "o_orderkey")
    // disable broadcast so the join must use the bucketed distribution
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val agg = joined.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val plan = {
        agg.collect() // finalize AQE
        agg.queryExecution.executedPlan.toString
      }
      // one Exchange is allowed ABOVE the join (for the groupBy); the
      // join inputs themselves must read bucketed scans directly
      val joinSection = plan.split("SortMergeJoin|ShuffledHashJoin")
      assert(joinSection.length >= 2, s"no shuffle-family join in:\n$plan")
      assert(!joinSection.last.contains("Exchange"),
        s"join inputs should be exchange-free (bucketed):\n$plan")

      val viaBuckets = joined.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val plain = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(viaBuckets == plain)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
