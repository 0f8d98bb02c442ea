package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, LogicalPlan}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{TopKPerKey => TopKApi}

/** The custom TopKPerKey node must not be an optimization barrier:
  * deterministic key-only filters written ABOVE it push below (and on to
  * the parquet scan's PushedFilters), projections prune the scan's
  * ReadSchema, and non-key filters stay put. Each plan assertion is paired
  * with a result-equality check against the window formulation so the
  * rewrites are provably semantics-preserving.
  */
class TopKOptimizationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  private def optimized(df: DataFrame): LogicalPlan =
    df.queryExecution.optimizedPlan

  private def scanPlan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def windowTopK(k: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("event_id"))
    Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
  }

  test("key-only filter pushes below TopKPerKey and into PushedFilters") {
    val df = TopKApi.topKPerKey(Tables.events(spark, sf),
        Seq("user_id"), Seq(("event_id", false)), 5)
      .filter(col("user_id") < 8)
    val opt = optimized(df)
    // after the rewrite the custom node's CHILD carries the filter
    val below = opt.collect { case t: graft.plans.TopKPerKey =>
      t.child.collect { case f: LFilter => f }.nonEmpty }
    assert(below.exists(identity), opt.toString)
    // no Filter remains ABOVE the custom node
    val above = opt.collect { case f: LFilter =>
      f.child.collect { case t: graft.plans.TopKPerKey => t }.nonEmpty }
    assert(!above.exists(identity), opt.toString)
    // and the predicate reached the parquet scan
    val plan = scanPlan(df)
    assert(plan.contains("PushedFilters") &&
      plan.contains("LessThan(user_id,8)"), plan)
    // semantics: identical to filtering the window formulation afterwards
    val got = df.select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = windowTopK(5).filter(col("user_id") < 8)
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect)
    assert(got.nonEmpty) // non-vacuous: the filter keeps some groups
    assert(got.map(_._1).max < 8)
  }

  test("non-key filter stays above the operator (it would change the k)") {
    val df = TopKApi.topKPerKey(Tables.events(spark, sf),
        Seq("user_id"), Seq(("event_id", false)), 5)
      .filter(col("event_id") > 100)
    val opt = optimized(df)
    val above = opt.collect { case f: LFilter =>
      f.child.collect { case t: graft.plans.TopKPerKey => t }.nonEmpty }
    assert(above.exists(identity), opt.toString)
    val got = df.select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = windowTopK(5).filter(col("event_id") > 100)
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect)
    // non-vacuous: the late filter really dropped competed-and-won rows
    assert(got.size < windowTopK(5).count())
  }

  test("mixed conjunction splits: key part below, payload part above") {
    val df = TopKApi.topKPerKey(Tables.events(spark, sf),
        Seq("user_id"), Seq(("event_id", true)), 7)
      .filter(col("user_id") >= 3 && col("value") > 0.2)
    val plan = scanPlan(df)
    assert(plan.contains("GreaterThanOrEqual(user_id,3)"), plan)
    assert(!plan.contains("GreaterThan(value"), plan) // NOT pushed to scan
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("event_id").desc)
    val expect = Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 7).drop("rn")
      .filter(col("user_id") >= 3 && col("value") > 0.2)
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = df.select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect && got.nonEmpty)
  }

  test("projection above TopKPerKey prunes the scan's ReadSchema") {
    val df = TopKApi.topKPerKey(Tables.events(spark, sf),
        Seq("user_id"), Seq(("event_id", false)), 5)
      .select("user_id", "event_id")
    val plan = scanPlan(df)
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    // events carries ts/event_type/value/props — none may be read
    for (c <- Seq("props", "event_type", "value"))
      assert(!readSchema.contains(c), readSchema)
    assert(readSchema.contains("user_id") && readSchema.contains("event_id"),
      readSchema)
    // identical rows to the unpruned query
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = windowTopK(5).select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect && got.nonEmpty)
  }

  test("randomized: rewritten plans equal the window formulation") {
    val rnd = new scala.util.Random(20260812L)
    val ev = Tables.events(spark, sf)
    for (_ <- 0 until 8) {
      val k = 1 + rnd.nextInt(9)
      val desc = rnd.nextBoolean()
      val keyTh = rnd.nextInt(15).toLong
      val payTh = rnd.nextDouble()
      val (useKey, usePay) = (rnd.nextBoolean(), rnd.nextBoolean())
      def filters(df: DataFrame): DataFrame = {
        val f1 = if (useKey) df.filter(col("user_id") <= keyTh) else df
        if (usePay) f1.filter(col("value") > payTh) else f1
      }
      val custom = filters(TopKApi.topKPerKey(ev, Seq("user_id"),
          Seq(("event_id", desc)), k))
        .select("user_id", "event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val w = Window.partitionBy(col("user_id"))
        .orderBy(if (desc) col("event_id").desc else col("event_id"))
      val reference = filters(ev.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k).drop("rn"))
        .select("user_id", "event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(custom == reference,
        s"k=$k desc=$desc keyF=$useKey($keyTh) payF=$usePay($payTh)")
    }
  }

  test("PushFilterThroughTopK rewrites the analyzed plan (unit)") {
    val base = TopKApi.topKPerKey(Tables.events(spark, sf),
      Seq("user_id"), Seq(("event_id", false)), 5)
    val analyzed = base.filter(col("user_id") < 8).queryExecution.analyzed
    val rewritten =
      graft.plans.TopKOptimizations.PushFilterThroughTopK(analyzed)
    val topks = rewritten.collect { case t: graft.plans.TopKPerKey => t }
    assert(topks.nonEmpty && topks.head.child.isInstanceOf[LFilter],
      rewritten.toString)
    assert(!rewritten.isInstanceOf[LFilter], rewritten.toString)
  }

  test("PruneColumnsThroughTopK inserts the narrow projection (unit)") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_id", "value")
    val base = TopKApi.topKPerKey(ev, Seq("user_id"),
      Seq(("event_id", false)), 5)
    val analyzed = base.select("user_id", "event_id")
      .queryExecution.analyzed
    val rewritten =
      graft.plans.TopKOptimizations.PruneColumnsThroughTopK(analyzed)
    val topks = rewritten.collect { case t: graft.plans.TopKPerKey => t }
    assert(topks.nonEmpty, rewritten.toString)
    // `value` (neither key, order, nor projected) was pruned below
    assert(topks.head.child.output.map(_.name).toSet ==
      Set("user_id", "event_id"), rewritten.toString)
    // idempotent: a second application changes nothing
    assert(graft.plans.TopKOptimizations.PruneColumnsThroughTopK(rewritten)
      .fastEquals(rewritten))
  }
}
