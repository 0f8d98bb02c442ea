package graft
import org.apache.spark.sql.SparkSession

/** Optimization-round A/B harness: interleaves two SQL-conf settings
  * WITHIN one JVM (A,B,A,B,... per query) so host drift hits both arms
  * equally. `runMain graft.ConfAb <sfDir> <confKey> <valA> <valB> <iters> q...`
  */
object ConfAb {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      // mirror Bench's session so A/B results transfer (r17)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "128k"))
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8192"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args(0)
    val key = args(1); val valA = args(2); val valB = args(3)
    val iters = args(4).toInt
    val qs = args.drop(5).toSeq
    def run(q: String): Double = {
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, d).count()
      (System.nanoTime() - t0) / 1e9
    }
    for (q <- qs) {
      // one warm-up per arm (JIT/codegen differs per plan shape)
      spark.conf.set(key, valA); run(q)
      spark.conf.set(key, valB); run(q)
      val as = scala.collection.mutable.ArrayBuffer.empty[Double]
      val bs = scala.collection.mutable.ArrayBuffer.empty[Double]
      for (_ <- 1 to iters) {
        spark.conf.set(key, valA); as += run(q)
        spark.conf.set(key, valB); bs += run(q)
      }
      def med(x: Seq[Double]) = x.sorted.apply((x.size - 1) / 2)
      println(f"AB $q%-26s A=${med(as.toSeq)}%6.2f B=${med(bs.toSeq)}%6.2f " +
        f"(A raw ${as.map(x => f"$x%.2f").mkString(",")} | " +
        f"B raw ${bs.map(x => f"$x%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
