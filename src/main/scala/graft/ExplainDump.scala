package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Writes `.explain("formatted")` for named queries to files — the
  * optimization round's plan-artifact dumper.
  *
  * `runMain graft.ExplainDump <sfDir> <outDir> <suffix> q1 q2 ...`
  * writes `<outDir>/<query>_<suffix>.txt`. Also appends the POST-RUN
  * executed plan (AQE final) so join-strategy and reuse decisions that
  * only materialize at runtime are visible in the artifact.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (d, outDir, suffix) = (args(0), args(1), args(2))
    new java.io.File(outDir).mkdirs()
    for (n <- args.drop(3)) {
      val df = SparkEntry.queries(n)(spark, d)
      val sb = new StringBuilder
      sb ++= s"== $n @ $d ==\n\n"
      // capture explain("formatted") — Dataset.explain prints to stdout,
      // so go through the ExplainMode API instead
      sb ++= df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      df.count()
      sb ++= "\n== executed (AQE final) ==\n"
      sb ++= (df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case p => p.toString
      })
      Files.write(Paths.get(s"$outDir/${n}_$suffix.txt"),
        sb.toString.getBytes("UTF-8"))
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      println(s"wrote $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
