package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE must handle single-hot-key skew at RUNTIME: a shuffle join whose
  * build of one partition dwarfs the median gets split by
  * OptimizeSkewedJoin without any manual salting. (Manual salting stays
  * available — `r_join_salted` — for the cases AQE can't see, e.g.
  * skew introduced after the last exchange.)
  */
class AqeSkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  test("a hot key triggers AQE skew-join splitting") {
    import spark.implicits._
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // AQE has its OWN runtime threshold: without this, the 101-row
      // build side converts to a broadcast join at runtime and there is
      // no shuffle join left to skew-split
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "262144") // 256 KB — the hot partition is ~3 MB
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "65536")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "2")
      // 200k rows of key 0 vs a uniform 1-per-key tail: one partition
      // carries ~99% of the left side
      val left = spark.range(200000)
        .select(lit(0L).as("k"), col("id").as("v"))
        .union(spark.range(1000)
          .select((col("id") % 100 + 1).as("k"), col("id").as("v")))
      val right = spark.range(101).select(col("id").as("k"),
        col("id").as("rv"))
      val j = left.join(right, "k")
      assert(j.count() == 201000L) // every left row matches one right key
      j.collect()
      val plan = j.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(plan.toLowerCase.contains("skew"),
        s"no skew handling in final plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
