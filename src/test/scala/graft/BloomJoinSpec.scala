package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime Bloom-filter join pruning (SPARK-32268): when a shuffle join's
  * build side carries a selective filter, the optimizer injects a bloom
  * filter of the build-side join keys INTO the probe-side scan, so fact
  * rows that cannot match are dropped at the scan instead of being
  * shuffled — at 100 TB this is the difference between shuffling the
  * full fact table and shuffling the ~matching slice. The thresholds
  * default to cluster scale (10 GB probe-side scans); this spec lowers
  * them to fixture scale to prove the engine's query shapes are
  * ELIGIBLE — the probe scan gains a `might_contain` residual fed by a
  * `bloom_filter_agg` subquery over the build keys, and the answer is
  * unchanged.
  */
class BloomJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  private def withConf[A](pairs: (String, String)*)(f: => A): A = {
    val old = pairs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("a selective dim filter injects a bloom filter into the fact " +
      "scan under a shuffle join, with the answer unchanged") {
    val d = "/root/testdata/sf0.01"
    def q = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d)
          .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
    val plain = q.collect().toSeq
    val (bloomed, plan) = withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = q
      val rows = df.collect().toSeq
      (rows, df.queryExecution.executedPlan.toString)
    }
    assert(plan.contains("might_contain") &&
        plan.contains("bloom_filter_agg"),
      s"runtime bloom filter not injected:\n${plan.take(2000)}")
    assert(bloomed.map(_.toString).sorted == plain.map(_.toString).sorted)
  }
}
