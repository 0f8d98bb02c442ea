package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

import graft.pipeline.Dedup
import graft.streaming.IncrementalDedupStream.{readParts}

/** Streaming twin of `p_dedup_report` — the raw → exact → near →
  * containment attrition funnel maintained as documents ARRIVE, giving
  * the ingest pipeline the same observability the batch report gives a
  * finished corpus. One survivor index (fingerprints + rare-gram
  * postings + sizes) backs all three cuts, so only FULL-cascade
  * survivors ever enter the index — a doc the containment stage will
  * drop is never visible to the next batch's near-dup stage, exactly
  * like the batch cascade where each stage runs on the previous
  * stage's survivors.
  *
  * Semantics are the ingest family's ARRIVAL-ORDER FIRST-KEEPS (the
  * [[IncrementalDedupStream]] drop rule, applied per stage): a batch
  * doc drops if its stage-predicate holds against any live index doc
  * or any smaller-id doc of its own batch. That is deliberately NOT
  * the batch report's keep-min-per-cluster: a stream cannot retract an
  * already-accepted survivor when a smaller id arrives late, so the
  * streaming funnel is the ingest-order truth, the batch report the
  * corpus-relative one (both documented, each pinned by its own spec).
  * Per-batch df caps are index+batch-relative (only batch-present
  * grams can go hot — an index-only gram never joins anything).
  *
  * Steady-state cost per micro-batch: shingling is O(batch); the index
  * gram join prunes to batch-present grams via a broadcast membership
  * probe; pair enumeration is O(batch·df). Report state is ONE row of
  * four counts per micro-batch — observability at no meaningful cost
  * on top of the ingest joins themselves. Exactly-once under
  * at-least-once foreachBatch: every write (index and report) lands in
  * a `batch=<id>` overwrite partition and index reads exclude the
  * batch being (re)written, the family's idempotent replay discipline.
  */
object CascadeReportStream {
  private val FpSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("fp", StringType)))
  private val GramSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("g", LongType)))
  private val SizeSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("n0", LongType)))
  private val ReportSchema = StructType(Seq(
    StructField("n_raw", LongType), StructField("n_exact", LongType),
    StructField("n_near", LongType), StructField("n_cont", LongType)))

  /** One micro-batch through the three cuts. Public so the spec drives
    * the identical body without a stream (the family convention).
    */
  def ingestBatch(batch: DataFrame, batchId: Long, root: String,
      threshold: Double = 0.8, maxDf: Int = 20, pct: Int = 90,
      minShingles: Int = 5): Unit = {
    val spark = batch.sparkSession
    val b = batch.select("doc_id", "text").persist()
    val nRaw = b.count()

    // ---- stage 1: exact (content md5 vs index + smaller-id in batch)
    val fpB = b.select(col("doc_id"), md5(col("text")).as("fp")).persist()
    val iFp = readParts(spark, s"$root/fps", batchId, FpSchema)
    val minFp = fpB.groupBy("fp").agg(min(col("doc_id")).as("keep"))
    val drops1 = fpB
      .join(iFp.select("fp").distinct(), Seq("fp"), "left_semi")
      .select("doc_id")
      .union(fpB.join(minFp, "fp")
        .filter(col("doc_id") =!= col("keep")).select("doc_id"))
      .distinct()
    val s1 = b.join(drops1, Seq("doc_id"), "left_anti").persist()
    val nExact = s1.count()

    // shingle ONCE for the surviving batch docs; both gram stages and
    // the index write read these persisted frames
    val g1 = s1.select(col("doc_id"),
      explode(Dedup.shingleHashes(col("text"))).as("g")).persist()
    val sz1 = s1.select(col("doc_id"),
      size(Dedup.shingleHashes(col("text"))).cast("long").as("n0"))
      .persist()
    val iGramsAll = readParts(spark, s"$root/grams", batchId, GramSchema)
    val iSizes = readParts(spark, s"$root/sizes", batchId, SizeSchema)
    // index gram rows sharing a gram with the batch — all either stage
    // can ever join; batch gram sets are small, so the probe broadcasts
    val iRel = iGramsAll
      .join(broadcast(g1.select("g").distinct()), Seq("g")).persist()

    def hotSet(bGrams: DataFrame): DataFrame =
      if (maxDf <= 0)
        spark.createDataFrame(spark.sparkContext
            .emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("g", LongType))))
      else bGrams.groupBy("g").agg(count(lit(1)).as("cb"))
        .join(iRel.groupBy("g").agg(count(lit(1)).as("ci")),
          Seq("g"), "left")
        .filter(col("cb") + coalesce(col("ci"), lit(0L)) > maxDf)
        .select("g")
    def sized(sizes: DataFrame, grams: DataFrame,
        hot: DataFrame): DataFrame =
      sizes.join(grams.join(hot, Seq("g"))
          .groupBy("doc_id").agg(count(lit(1)).as("d")),
        Seq("doc_id"), "left")
        .select(col("doc_id"),
          (col("n0") - coalesce(col("d"), lit(0L))).as("n"))

    // ---- stage 2: near-dup (rare-space Jaccard >= threshold)
    val hot2 = hotSet(g1)
    val bK2 = g1.join(hot2, Seq("g"), "left_anti").persist()
    val iK2 = iRel.join(hot2, Seq("g"), "left_anti")
    val bN2 = sized(sz1, g1, hot2)
    val iN2 = sized(iSizes, iRel, hot2)
    def jaccardOk(i: org.apache.spark.sql.Column,
        na: org.apache.spark.sql.Column,
        nb: org.apache.spark.sql.Column) =
      i / (na + nb - i) >= threshold
    val cross2 = bK2.select(col("doc_id").as("bd"), col("g"))
      .join(iK2.select(col("doc_id").as("idoc"), col("g")), Seq("g"))
      .groupBy("bd", "idoc").agg(count(lit(1)).as("i"))
      .join(bN2.select(col("doc_id").as("bd"), col("n").as("na")), "bd")
      .join(iN2.select(col("doc_id").as("idoc"), col("n").as("nb")),
        "idoc")
      .filter(jaccardOk(col("i"), col("na"), col("nb")))
      .select(col("bd").as("doc_id"))
    val intra2 = bK2.groupBy("g")
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(explode(col("ids")).as("da"), col("ids"))
      .select(col("da"), explode(col("ids")).as("db"))
      .filter(col("da") < col("db"))
      .groupBy("da", "db").agg(count(lit(1)).as("i"))
      .join(bN2.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(bN2.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .filter(jaccardOk(col("i"), col("na"), col("nb")))
      .select(col("db").as("doc_id"))
    val drops2 = cross2.union(intra2).distinct()
    val s2 = s1.join(drops2, Seq("doc_id"), "left_anti").persist()
    val nNear = s2.count()

    // ---- stage 3: containment (100·i >= pct·n(batch doc), the
    // CONTAINED side is always the arriving doc — first-keeps cannot
    // retract an accepted container)
    val g2 = g1.join(s2.select("doc_id"), Seq("doc_id"), "left_semi")
      .persist()
    val hot3 = hotSet(g2)
    val bK3 = g2.join(hot3, Seq("g"), "left_anti").persist()
    val iK3 = iRel.join(hot3, Seq("g"), "left_anti")
    val bN3 = sized(sz1.join(s2.select("doc_id"), Seq("doc_id"),
      "left_semi"), g2, hot3)
    def containedOk(i: org.apache.spark.sql.Column,
        n: org.apache.spark.sql.Column) =
      n >= minShingles && i * 100 >= lit(pct) * n
    val cross3 = bK3.select(col("doc_id").as("bd"), col("g"))
      .join(iK3.select(col("doc_id").as("idoc"), col("g")), Seq("g"))
      .groupBy("bd", "idoc").agg(count(lit(1)).as("i"))
      .join(bN3.select(col("doc_id").as("bd"), col("n")), "bd")
      .filter(containedOk(col("i"), col("n")))
      .select(col("bd").as("doc_id"))
    // intra-batch: either direction can drop the CONTAINED doc — both
    // tested from the one unordered pair row (the batch operator's
    // bounded 2x explode)
    val intra3 = bK3.groupBy("g")
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(explode(col("ids")).as("da"), col("ids"))
      .select(col("da"), explode(col("ids")).as("db"))
      .filter(col("da") < col("db"))
      .groupBy("da", "db").agg(count(lit(1)).as("i"))
      .join(bN3.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(bN3.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .select(col("i"), explode(array(
        struct(col("da").as("d"), col("na").as("n")),
        struct(col("db").as("d"), col("nb").as("n")))).as("x"))
      .filter(containedOk(col("i"), col("x.n")))
      .select(col("x.d").as("doc_id"))
    val drops3 = cross3.union(intra3).distinct()
    val s3 = s2.join(drops3, Seq("doc_id"), "left_anti").persist()
    val nCont = s3.count()

    // ---- index + report writes (cascade survivors only)
    fpB.join(s3.select("doc_id"), Seq("doc_id"), "left_semi")
      .write.mode("overwrite").parquet(s"$root/fps/batch=$batchId")
    g1.join(s3.select("doc_id"), Seq("doc_id"), "left_semi")
      .write.mode("overwrite").parquet(s"$root/grams/batch=$batchId")
    sz1.join(s3.select("doc_id"), Seq("doc_id"), "left_semi")
      .write.mode("overwrite").parquet(s"$root/sizes/batch=$batchId")
    import spark.implicits._
    Seq((nRaw, nExact, nNear, nCont))
      .toDF("n_raw", "n_exact", "n_near", "n_cont")
      .write.mode("overwrite").parquet(s"$root/report/batch=$batchId")

    Seq(s3, bK3, g2, s2, bK2, iRel, g1, sz1, s1, fpB, b)
      .foreach(_.unpersist())
  }

  /** The stream's cumulative funnel — shaped exactly like
    * `p_dedup_report`: (stage, n_docs), 4 rows. Counts are ADDITIVE
    * across batches (each batch's row counts its own docs at each
    * stage), so the view is one sum over the calendar-of-batches-sized
    * report table.
    */
  def report(spark: SparkSession, root: String): DataFrame = {
    val r = readParts(spark, s"$root/report", -1L, ReportSchema)
      .agg(coalesce(sum("n_raw"), lit(0L)).as("r0"),
        coalesce(sum("n_exact"), lit(0L)).as("r1"),
        coalesce(sum("n_near"), lit(0L)).as("r2"),
        coalesce(sum("n_cont"), lit(0L)).as("r3"))
    r.selectExpr("stack(4, '0_raw', r0, '1_exact', r1, '2_near', r2, " +
      "'3_containment', r3) AS (stage, n_docs)")
  }

  /** Start the cascade on a streaming `docs` frame (doc_id, text). */
  def start(docs: DataFrame, root: String, checkpoint: String,
      threshold: Double = 0.8, maxDf: Int = 20): StreamingQuery = {
    val body: (DataFrame, Long) => Unit =
      (b, id) => ingestBatch(b, id, root, threshold, maxDf)
    docs.writeStream
      .foreachBatch(body)
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
