package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.BandJoinRewrite

/** BandJoinRewrite: the naive `abs(l − r) <= δ` join spelling must plan
  * as a hash join (not a nested-loop product) once the rule is active,
  * with the answer unchanged against the rule-off run — inner and
  * left_outer, boundary rows included; an equi-join with a band
  * residual must be left alone; and the rewritten plan must not
  * re-trigger the rule.
  */
class BandJoinRuleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def withRule[A](f: => A): A = {
    val classic =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val before = classic.experimental.extraOptimizations
    classic.experimental.extraOptimizations = before :+ BandJoinRewrite
    try f
    finally classic.experimental.extraOptimizations = before
  }

  private def l = Seq((1L, -150L), (2L, 0L), (3L, 60L), (4L, 1000L))
    .toDF("lid", "lus")
  private def r = Seq((10L, -90L), (11L, 1L), (12L, 120L), (13L, 5000L))
    .toDF("rid", "rus")

  test("naive inner band join: plan gains a hash join, loses the " +
      "nested loop, answer unchanged") {
    def q = l.join(r, abs(col("lus") - col("rus")) <= lit(60L))
      .select("lid", "rid")
    val naive = q.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val (rows, plan) = withRule {
      val df = q
      (df.collect().map(x => (x.getLong(0), x.getLong(1))).toSet,
        df.queryExecution.executedPlan.toString)
    }
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"rule did not fire:\n${plan.take(1500)}")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"))
    assert(rows == naive)
    assert(rows == Set((1L, 10L), (2L, 11L), (3L, 11L), (3L, 12L)))
  }

  test("naive left_outer band join: unmatched lefts survive exactly " +
      "once with null right") {
    def q = l.join(r, abs(col("lus") - col("rus")) <= lit(60L),
      "left_outer").select("lid", "rid")
    val naive = q.collect().map(_.toString).sorted.toSeq
    val (rows, plan) = withRule {
      val df = q
      (df.collect().map(_.toString).sorted.toSeq,
        df.queryExecution.executedPlan.toString)
    }
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(rows == naive)
    assert(rows.count(_.contains("[4,null]")) == 1,
      s"lid=4 must appear exactly once unmatched: $rows")
  }

  test("the BETWEEN spelling (two conjuncts, no abs) fires too, " +
      "including asymmetric bounds") {
    def q = l.join(r,
      col("lus") <= col("rus") + lit(90L) &&
        col("lus") >= col("rus") - lit(30L))
      .select("lid", "rid")
    val naive = q.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val (rows, plan) = withRule {
      val df = q
      (df.collect().map(x => (x.getLong(0), x.getLong(1))).toSet,
        df.queryExecution.executedPlan.toString)
    }
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"rule did not fire on the BETWEEN form:\n${plan.take(1500)}")
    assert(rows == naive)
    // asymmetric reference: lus − rus ∈ [−30, 90]
    val want = (for {
      (lid, lus) <- Seq((1L, -150L), (2L, 0L), (3L, 60L), (4L, 1000L))
      (rid, rus) <- Seq((10L, -90L), (11L, 1L), (12L, 120L), (13L, 5000L))
      if lus - rus >= -30L && lus - rus <= 90L
    } yield (lid, rid)).toSet
    assert(rows == want)
  }

  test("timestamp columns with INTERVAL arithmetic fire too — the " +
      "spelling event pipelines actually write") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val lt = Seq((1L, ts("2024-01-01 00:00:00")),
      (2L, ts("2024-01-01 02:00:00"))).toDF("lid", "lts")
    val rt = Seq((10L, ts("2024-01-01 00:00:45")),
      (11L, ts("2024-01-01 01:59:00")),
      (12L, ts("2024-01-01 05:00:00"))).toDF("rid", "rts")
    def q = lt.join(rt,
      col("lts") <= col("rts") + expr("INTERVAL 60 SECONDS") &&
        col("lts") >= col("rts") - expr("INTERVAL 60 SECONDS"))
      .select("lid", "rid")
    val naive = q.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val (rows, plan) = withRule {
      val df = q
      (df.collect().map(x => (x.getLong(0), x.getLong(1))).toSet,
        df.queryExecution.executedPlan.toString)
    }
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"rule did not fire on INTERVAL timestamps:\n${plan.take(1500)}")
    assert(rows == naive)
    assert(rows == Set((1L, 10L), (2L, 11L)))
  }

  test("an equi-join with a band residual is left alone (already a " +
      "hash join — the rewrite would only add overhead)") {
    val le = Seq((1L, 0L, "k1")).toDF("lid", "lus", "lk")
    val re = Seq((10L, 30L, "k1")).toDF("rid", "rus", "rk")
    withRule {
      val df = le.join(re, col("lk") === col("rk") &&
        abs(col("lus") - col("rus")) <= lit(60L))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("__lband"),
        s"rule fired on an equi join:\n$optimized")
      assert(df.count() == 1)
    }
  }

  test("GraftExtensions injects the rule (introspected — getOrCreate " +
      "would share the live session, so the extensions object is " +
      "checked directly)") {
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions()(e)
    val rules = org.apache.spark.sql.graftshim.Bridge
      .extensionOptimizerRules(e, spark)
    assert(rules.contains(BandJoinRewrite),
      s"extension rule set missing BandJoinRewrite: $rules")
  }
}
