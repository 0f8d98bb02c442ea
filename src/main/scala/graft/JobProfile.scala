package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Optimization-round profiler: `runMain graft.JobProfile <sfDir> q1 q2 ...`
  *
  * Runs each named registry query twice (first run pays JIT/codegen, the
  * second is the measured one) and prints, for the measured run, one line
  * per Spark JOB (wall seconds, executor task-time seconds, shuffle
  * read/write MB, peak stage task count) so the expensive stage of a
  * multi-action builder is visible without the UI (disabled in this
  * sandbox). Guide §1: measure before changing anything.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      // mirror Bench's session so profiles reflect bench conditions
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "128k"))
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8192"))
      .config("spark.ui.enabled", "false")
    // experiment knob: SPARK_GRAFT_PROF_CONF="k=v;k=v" extra confs
    sys.env.get("SPARK_GRAFT_PROF_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val qs = args.drop(1).toSeq

    case class Job(id: Int, var t0: Long = 0L, var t1: Long = 0L,
      var taskNanos: Long = 0L, var shufR: Long = 0L, var shufW: Long = 0L,
      var inBytes: Long = 0L, var nTasks: Int = 0)
    val jobs = scala.collection.mutable.LinkedHashMap.empty[Int, Job]
    val stage2job = scala.collection.mutable.HashMap.empty[Int, Int]
    var record = false
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (record) {
          jobs(e.jobId) = Job(e.jobId, t0 = e.time)
          e.stageIds.foreach(sid => stage2job(sid) = e.jobId)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.t1 = e.time)
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        for (jid <- stage2job.get(e.stageInfo.stageId);
             j <- jobs.get(jid)) {
          val m = e.stageInfo.taskMetrics
          if (m != null) {
            j.taskNanos += m.executorRunTime * 1000000L
            j.shufR += m.shuffleReadMetrics.totalBytesRead
            j.shufW += m.shuffleWriteMetrics.bytesWritten
            j.inBytes += m.inputMetrics.bytesRead
          }
          j.nTasks += e.stageInfo.numTasks
        }
    }
    spark.sparkContext.addSparkListener(listener)
    val iters = sys.env.getOrElse("SPARK_GRAFT_PROF_ITERS", "1").toInt
    val perJob = !sys.env.contains("SPARK_GRAFT_PROF_TOTALS_ONLY")
    for (q <- qs) {
      // warm-up run (uncounted)
      try SparkEntry.queries(q)(spark, d).count()
      catch { case e: Throwable => println(s"WARMUP FAIL $q: $e") }
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      val totals = (1 to iters).map { _ =>
        jobs.clear(); stage2job.clear()
        record = true
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(q)(spark, d).count()
        val wall = (System.nanoTime() - t0) / 1e9
        record = false
        // let straggler listener events drain
        Thread.sleep(300)
        if (perJob) {
          println(f"== $q rows=$n wall=$wall%.2f s, ${jobs.size} jobs")
          for ((_, j) <- jobs)
            println(f"  job ${j.id}%3d wall=${(j.t1 - j.t0) / 1e3}%7.2f s " +
              f"taskTime=${j.taskNanos / 1e9}%7.2f s tasks=${j.nTasks}%4d " +
              f"in=${j.inBytes / 1e6}%8.1f MB " +
              f"shufR=${j.shufR / 1e6}%8.1f MB " +
              f"shufW=${j.shufW / 1e6}%8.1f MB")
        }
        try spark.catalog.clearCache() catch { case _: Throwable => () }
        (wall, jobs.size, jobs.valuesIterator.map(_.taskNanos).sum / 1e9,
          jobs.valuesIterator.map(_.nTasks.toLong).sum,
          jobs.valuesIterator.map(_.shufW).sum / 1e6)
      }
      def med[T: Ordering](f: ((Double, Int, Double, Long, Double)) => T) =
        totals.map(f).sorted.apply((totals.size - 1) / 2)
      println(f"TOTAL $q%-26s wall=${med(_._1)}%6.2f jobs=${med(_._2)}%3d " +
        f"taskSec=${med(_._3)}%7.1f tasks=${med(_._4)}%5d " +
        f"shufW=${med(_._5)}%7.1f MB")
    }
    spark.stop()
  }
}
