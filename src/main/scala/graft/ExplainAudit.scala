package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan audit (run: `sbt "runMain graft.ExplainAudit"`): asserts
  * the plan shapes the 100 TB design depends on — filters on the scan,
  * dimension broadcasts, top-k without global sort, whole-stage codegen.
  * Executes each query first so AQE's FINAL plan is inspected, not the
  * pre-execution wrapper.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    var failed = 0

    def finalPlan(name: String): String = {
      val df = SparkEntry.queries(name)(spark, d)
      df.collect() // execute THIS QueryExecution so AQE finalizes + codegen collapses
      df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
    }
    def audit(name: String, expect: String*): Unit = {
      val plan = finalPlan(name)
      val missing = expect.filterNot(plan.contains)
      if (missing.isEmpty) println(s"AUDIT $name: OK")
      else { failed += 1
        println(s"AUDIT $name: MISSING ${missing.mkString(",")}") }
    }

    audit("f_eq", "*(", "Filter")                         // codegen'd filter
    audit("r_local_supplier_volume", "BroadcastHashJoin") // dims broadcast
    audit("r_topk", "TakeOrderedAndProject")              // no global sort
    audit("ckpt_after_seq_restart", "BroadcastHashJoin")  // ckpt broadcast
    audit("s_ann_bruteforce", "BroadcastNestedLoopJoin")  // corpus unshuffled
    audit("t_rolling_fingerprint", "*(")                  // custom expr fused
    audit("d_embedding_dup", "BroadcastNestedLoopJoin")

    val scan = Tables.lineitem(spark, d).select("l_orderkey", "l_quantity")
      .queryExecution.executedPlan.toString
    val pruned = scan.contains(
      "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>")
    if (!pruned) failed += 1
    println("AUDIT column-pruning: " + (if (pruned) "OK" else "FAIL"))

    println(if (failed == 0) "AUDIT RESULT: ALL OK"
      else s"AUDIT RESULT: $failed FAILURES")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
