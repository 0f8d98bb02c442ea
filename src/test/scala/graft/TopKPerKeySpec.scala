package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TopKPerKey

/** The custom bounded-heap top-K operator must agree with the window
  * formulation row-for-row, and its physical plan must carry the
  * clustered-distribution exchange (or none when pre-partitioned).
  */
class TopKPerKeySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("event_id"))
    Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
  }

  test("bounded-heap top-K equals the window formulation") {
    val ev = Tables.events(spark, sf)
    val custom = TopKPerKey.topKPerKey(ev, Seq("user_id"),
      Seq(("event_id", false)), 50)
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val window = windowTopK(50)
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(custom == window)
    assert(custom.nonEmpty)
  }

  test("descending order: largest k per key") {
    val ev = Tables.events(spark, sf)
    val custom = TopKPerKey.topKPerKey(ev, Seq("user_id"),
      Seq(("event_id", true)), 3)
      .groupBy("user_id").agg(max("event_id").as("mx"), count(lit(1)).as("n"))
    val expect = ev.groupBy("user_id")
      .agg(max("event_id").as("mx"))
    val joined = custom.as("c").join(expect.as("e"), "user_id")
      .filter(col("c.mx") =!= col("e.mx") || col("n") =!= 3)
    assert(joined.count() == 0) // per key: exactly 3 rows incl. the max
  }

  test("physical plan is TopKPerKeyExec over a hash exchange") {
    val ev = Tables.events(spark, sf)
    val df = TopKPerKey.topKPerKey(ev, Seq("user_id"),
      Seq(("event_id", false)), 5)
    val plan = df.queryExecution.executedPlan.toString
    // TreeNode.nodeName strips the "Exec" suffix in plan strings
    assert(plan.contains("TopKPerKey"), plan.take(500))
    assert(plan.contains("hashpartitioning(user_id"), plan.take(500))
    // and crucially: NO sort operator — that's the point
    assert(!plan.contains("Sort ["), plan.take(500))
  }

  test("k larger than group size returns whole groups") {
    import spark.implicits._
    val df = Seq((1, 10), (1, 20), (2, 30)).toDF("k", "v")
    val out = TopKPerKey.topKPerKey(df, Seq("k"), Seq(("v", false)), 99)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(out == Set((1, 10), (1, 20), (2, 30)))
  }

  test("invalid k rejected") {
    import spark.implicits._
    val df = Seq((1, 10)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      TopKPerKey.topKPerKey(df, Seq("k"), Seq(("v", false)), 0)
    }
  }
}
