package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query profiler: `runMain graft.ProfileMain <sfDir> q1 q2 ...`
  * Runs each named query 3× and prints wall-clock per iteration.
  */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val qs =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("d_simhash", "d_ngram_jaccard", "d_minhash_lsh")
    for (q <- qs; i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, d).count()
      println(f"PROF $q%-18s iter$i rows=$n%-6d ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
