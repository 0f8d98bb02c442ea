package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic (optimization round): does AQE stage reuse collapse
  * the two structurally-identical sides of a self-join (a) on a plain
  * aggregate, (b) on an aggregate over an InMemoryRelation (persisted
  * upstream), (c) with differing output aliases? Prints the job/stage
  * count per case — if reuse works, the build side runs once.
  */
object ReuseCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sc = spark.sparkContext
    var stages = 0
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        stages += 1
    })
    def run(tag: String)(f: => Long): Unit = {
      stages = 0
      val n = f
      Thread.sleep(300)
      println(s"CASE $tag rows=$n stages=$stages")
    }
    // heavy-ish aggregate so duplicated work is visible
    def agged = spark.range(0, 2000000, 1, 8)
      .select((col("id") % 5000).as("k"),
        xxhash64(xxhash64(col("id"))).as("v"))
      .groupBy("k").agg(sum("v").as("sv"), count(lit(1)).as("c"))

    run("plain-selfjoin-same-alias") {
      val b = agged
      b.as("a").join(b.as("b"), "k").count()
    }
    run("selfjoin-renamed") {
      val b = agged
      b.select(col("k"), col("sv").as("x"))
        .join(b.select(col("k"), col("sv").as("y")), "k").count()
    }
    val p = spark.range(0, 2000000, 1, 8)
      .select((col("id") % 5000).as("k"),
        xxhash64(xxhash64(col("id"))).as("v")).persist()
    p.count()
    run("selfjoin-over-cache") {
      val b = p.groupBy("k").agg(sum("v").as("sv"))
      b.select(col("k"), col("sv").as("x"))
        .join(b.select(col("k"), col("sv").as("y")), "k").count()
    }
    run("selfjoin-collectlist-over-cache") {
      val b = p.groupBy("k")
        .agg(sort_array(collect_list(struct(col("v")))).as("sig"))
      b.select(col("k"), col("sig"), col("k").as("da"))
        .join(b.select(col("sig"), col("k").as("db")), "sig").count()
    }
    // final-plan inspection: execute the df's OWN QueryExecution so the
    // AQE-final plan (with any Reused* nodes) is printable afterwards
    val b = p.groupBy("k")
      .agg(sort_array(collect_list(struct(col("v")))).as("sig"))
    val j = b.select(col("k"), col("sig"), col("k").as("da"))
      .join(b.select(col("sig"), col("k").as("db")), "sig")
      .select(col("da"), col("db"))
    j.queryExecution.toRdd.foreach(_ => ())
    println("==== final plan (collectlist self-join over cache) ====")
    println(j.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case pl => pl.toString
    })
    spark.stop()
  }
}
