package graft
import org.apache.spark.sql.SparkSession
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    for (q <- Seq("d_simhash", "d_ngram_jaccard", "d_minhash_lsh"); i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, d).count()
      println(f"PROF $q%-18s iter$i rows=$n%-6d ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
