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
      assert(!optimized.contains("__kband"),
        s"rule fired on an equi join:\n$optimized")
      assert(df.count() == 1)
    }
  }

  test("naive right_outer band join: unmatched rights survive exactly " +
      "once with null left (the LEFT side replicates)") {
    def q = l.join(r, abs(col("lus") - col("rus")) <= lit(60L),
      "right_outer").select("lid", "rid")
    val naive = q.collect().map(_.toString).sorted.toSeq
    val (rows, plan) = withRule {
      val df = q
      (df.collect().map(_.toString).sorted.toSeq,
        df.queryExecution.executedPlan.toString)
    }
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"rule did not fire on right_outer:\n${plan.take(1500)}")
    assert(rows == naive)
    assert(rows.count(_.contains("[null,13]")) == 1,
      s"rid=13 must appear exactly once unmatched: $rows")
  }

  test("DOUBLE operands fire on the doubled-width bucket path, answer " +
      "unchanged incl. exact-boundary pairs") {
    val ld = Seq((1L, -1.5), (2L, 0.0), (3L, 0.6), (4L, 10.0))
      .toDF("lid", "lx")
    val rd = Seq((10L, -0.9), (11L, 0.01), (12L, 1.2), (13L, 50.0),
      (14L, 0.6 + 0.6)) // rx − lx(3) == δ exactly in IEEE
      .toDF("rid", "rx")
    def q = ld.join(rd, abs(col("lx") - col("rx")) <= lit(0.6))
      .select("lid", "rid")
    val naive = q.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val (rows, plan) = withRule {
      val df = q
      (df.collect().map(x => (x.getLong(0), x.getLong(1))).toSet,
        df.queryExecution.executedPlan.toString)
    }
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"rule did not fire on doubles:\n${plan.take(1500)}")
    assert(rows == naive)
    assert(rows.contains((3L, 14L)), "exact |Δ| == δ boundary pair kept")
  }

  test("DECIMAL operands fire too — residual stays exact decimal " +
      "arithmetic") {
    val ld = Seq("1.50", "3.00", "99.99").zipWithIndex
      .map { case (v, i) => (i.toLong, BigDecimal(v)) }
      .toDF("lid", "lx")
    val rd = Seq("1.25", "2.75", "50.00").zipWithIndex
      .map { case (v, i) => (100L + i, BigDecimal(v)) }
      .toDF("rid", "rx")
    def q = ld.join(rd,
      abs(col("lx") - col("rx")) <= lit(BigDecimal("0.25")))
      .select("lid", "rid")
    val naive = q.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val (rows, plan) = withRule {
      val df = q
      (df.collect().map(x => (x.getLong(0), x.getLong(1))).toSet,
        df.queryExecution.executedPlan.toString)
    }
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"rule did not fire on decimals:\n${plan.take(1500)}")
    assert(rows == naive)
    assert(rows == Set((0L, 100L), (1L, 101L)))
  }

  test("Int operands do NOT fire — with ANSI off, wrapped Int " +
      "arithmetic can satisfy both conjuncts for a far-apart pair, " +
      "and an optimizer rule must never change results") {
    val ansiBefore = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val li = Seq((1L, Int.MinValue), (2L, 0)).toDF("lid", "lx")
      val ri = Seq((10L, Int.MaxValue), (11L, 3)).toDF("rid", "rx")
      def q = li.join(ri,
        col("lx") - col("rx") <= lit(5) &&
          col("rx") - col("lx") <= lit(5))
        .select("lid", "rid")
      val naive = q.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      // the wrap really happens: MinValue − MaxValue wraps to 1 ≤ 5 and
      // MaxValue − MinValue wraps to −1 ≤ 5, so the far-apart pair IS
      // in the naive answer — a bucket equality would drop it
      assert(naive.contains((1L, 10L)), s"wrap premise broken: $naive")
      val (rows, plan) = withRule {
        val df = q
        (df.collect().map(x => (x.getLong(0), x.getLong(1))).toSet,
          df.queryExecution.optimizedPlan.toString)
      }
      assert(!plan.contains("__kband"), s"rule fired on Int operands")
      assert(rows == naive, "results unchanged either way")
    } finally spark.conf.set("spark.sql.ansi.enabled", ansiBefore)
  }

  test("extreme-magnitude doubles FAIL LOUD under the rewrite instead " +
      "of silently dropping qualifying pairs (|x|/2δ beyond the " +
      "floor-division soundness bound)") {
    // at |x| ≈ 2⁶⁰ with δ = 0.5, floor(x/2δ) cannot resolve the band —
    // an unguarded rewrite would keep the pair or drop it by luck; the
    // guard turns the luck into a runtime error naming the escape hatch
    val big = math.pow(2.0, 60)
    val ld = Seq((1L, big)).toDF("lid", "lx")
    val rd = Seq((10L, big + 0.25)).toDF("rid", "rx")
    def q = ld.join(rd, abs(col("lx") - col("rx")) <= lit(0.5))
      .select("lid", "rid")
    val e = intercept[Exception] { withRule { q.collect() } }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("BandJoinRewrite")),
      s"expected the bucket guard's error, got: $e")
  }

  test("non-finite doubles stay well-defined under the rewrite: NaN " +
      "pairs with NaN and same-sign infinities pair under the BETWEEN " +
      "spelling (sentinel buckets + residual), nothing non-finite " +
      "matches under the abs spelling, and no row errors") {
    val nan = Double.NaN
    val pInf = Double.PositiveInfinity
    val nInf = Double.NegativeInfinity
    val ld = Seq((1L, nan), (2L, pInf), (3L, nInf), (4L, 0.0))
      .toDF("lid", "lx")
    val rd = Seq((10L, nan), (11L, pInf), (12L, nInf), (13L, 0.1))
      .toDF("rid", "rx")
    // BETWEEN spelling: inf ≤ inf + δ holds, and Spark orders NaN =
    // NaN (largest), so NaN ≤ NaN + δ holds too — both pair with
    // themselves in the un-rewritten plan; the rewrite must keep that
    def q = ld.join(rd,
      col("lx") <= col("rx") + lit(0.5) &&
        col("rx") <= col("lx") + lit(0.5))
      .select("lid", "rid")
    val naive = q.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(naive == Set((1L, 10L), (2L, 11L), (3L, 12L), (4L, 13L)),
      s"premise: naive plan pairs NaN-NaN and same-sign inf, got $naive")
    val (rows, plan) = withRule {
      val df = q
      (df.collect().map(x => (x.getLong(0), x.getLong(1))).toSet,
        df.queryExecution.optimizedPlan.toString)
    }
    assert(plan.contains("__kband"), "rule must fire on this shape")
    assert(rows == naive, "rewrite changed the non-finite answer")
    // and the abs spelling, where NaN residuals exclude infinities too
    def qa = ld.join(rd, abs(col("lx") - col("rx")) <= lit(0.5))
      .select("lid", "rid")
    val naiveA = qa.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val rowsA = withRule {
      qa.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    }
    assert(rowsA == naiveA, "abs spelling diverged on non-finite rows")
  }

  test("the continuous path honors its conf gate: disabled, the plan " +
      "stays un-rewritten and extreme magnitudes answer correctly") {
    val big = math.pow(2.0, 60)
    val ld = Seq((1L, big), (2L, 0.0)).toDF("lid", "lx")
    val rd = Seq((10L, big + 0.25), (11L, 0.1)).toDF("rid", "rx")
    def q = ld.join(rd, abs(col("lx") - col("rx")) <= lit(0.5))
      .select("lid", "rid")
    spark.conf.set(BandJoinRewrite.ContinuousEnabledKey, "false")
    try {
      val (rows, plan) = withRule {
        val df = q
        (df.collect().map(x => (x.getLong(0), x.getLong(1))).toSet,
          df.queryExecution.optimizedPlan.toString)
      }
      assert(!plan.contains("__kband"), "continuous path must not fire")
      assert(rows == Set((1L, 10L), (2L, 11L)))
    } finally spark.conf.unset(BandJoinRewrite.ContinuousEnabledKey)
  }

  test("differential property: 25 random double configs agree with " +
      "the naive cross-filter under the rule, inner and right_outer") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 25) {
      val delta = Seq(0.1, 0.7, 3.0, 60.0)(rnd.nextInt(4))
      def x(): Double = {
        val base = (rnd.nextDouble() - 0.5) * delta * 30
        rnd.nextInt(3) match {
          case 0 => math.floor(base / delta) * delta // bucket edge
          case 1 => math.floor(base / delta) * delta + delta
          case _ => base
        }
      }
      val ls = Seq.tabulate(10)(i => (i.toLong, x()))
      val rs = Seq.tabulate(10)(i => (100L + i, x()))
      val jt = if (trial % 2 == 0) "inner" else "right_outer"
      def q = ls.toDF("lid", "lx").join(rs.toDF("rid", "rx"),
        abs(col("lx") - col("rx")) <= lit(delta), jt)
        .select("lid", "rid")
      val naive = q.collect().map(_.toString).sorted.toSeq
      val (rows, plan) = withRule {
        val df = q
        (df.collect().map(_.toString).sorted.toSeq,
          df.queryExecution.executedPlan.toString)
      }
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"trial $trial (δ=$delta, $jt): rule did not fire")
      assert(rows == naive,
        s"trial $trial (δ=$delta, $jt): results diverge")
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
