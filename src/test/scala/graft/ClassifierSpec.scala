package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Classifier

/** Pins the sample-train-broadcast-apply classifier to an independently
  * coded sequential reference (the BPE/Unigram discipline), plus the
  * properties the oracle hash can't localize: partition-independence of
  * the extracted sample, visit-order semantics, and that the learned
  * model actually RECOVERS the planted signal (the whole point of a
  * quality filter).
  */
class ClassifierSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val Nibbles = 3

  /** Same md5-nibble bucket as the engine, computed with the JDK. */
  private def bucket(w: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(w.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, Nibbles), 16)
  }

  /** Sequential reference over plain Scala collections: plant, hash,
    * sample, online-train in doc_id order.
    */
  private def referenceWeights(
      docs: Seq[(Long, String)], epochs: Int): Map[Long, Long] = {
    val sample = docs
      .filter { case (id, _) => ((id * 2654435761L) % 4294967296L) % 4 == 0 }
      .sortBy(_._1)
      .map { case (id, text) =>
        val y = if (id % 3 == 0) 1L else -1L
        val t =
          if (id % 10 == 7) text
          else if (id % 3 == 0) text + " helpful insight"
          else text + " clickbait"
        val counts = t.split(" ").filter(_.nonEmpty)
          .groupBy(bucket).map { case (b, ws) => b -> ws.length.toLong }
        (y, counts)
      }
    val w = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for (_ <- 1 to epochs; (y, counts) <- sample) {
      val s = counts.map { case (b, c) => c * w(b) }.sum
      if (y * s <= 0)
        counts.foreach { case (b, c) => w(b) += y * c }
    }
    w.toMap
  }

  private lazy val rawDocs: Seq[(Long, String)] =
    Tables.documents(spark, sf).select("doc_id", "text").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1)))

  private def engineSampleFeats = Classifier.featureCounts(
    Tables.documents(spark, sf),
    Classifier.plantedLabel(col("doc_id")),
    Classifier.plantedText(col("doc_id"), col("text")), Nibbles)
    .filter(Classifier.inSample(col("doc_id")))

  test("distributed-extract + driver-train equals the sequential reference") {
    val dist = Classifier.trainOnlinePerceptron(engineSampleFeats, 3)
      .filter(_._2 != 0L)
    val ref = referenceWeights(rawDocs, 3).filter(_._2 != 0L)
    assert(dist == ref)
  }

  test("weights are independent of the input partitioning (1 vs 13)") {
    def weights(parts: Int): Map[Long, Long] = {
      val docs = Tables.documents(spark, sf).repartition(parts)
      Classifier.trainOnlinePerceptron(
        Classifier.featureCounts(docs,
          Classifier.plantedLabel(col("doc_id")),
          Classifier.plantedText(col("doc_id"), col("text")), Nibbles)
          .filter(Classifier.inSample(col("doc_id"))), 2)
        .filter(_._2 != 0L)
    }
    assert(weights(1) == weights(13))
  }

  test("online visit order matters and is doc_id order (not arrival order)") {
    // a permuted-order sequential run diverges on this data, proving the
    // doc_id sort in trainOnlinePerceptron is load-bearing
    val canonical = referenceWeights(rawDocs, 3)
    val permuted = referenceWeights(rawDocs.sortBy(-_._1), 3)
    // referenceWeights sorts internally, so permuting INPUT must not change it
    assert(canonical == permuted)
    val engine = Classifier.trainOnlinePerceptron(engineSampleFeats, 3)
      .filter(_._2 != 0L)
    assert(engine == canonical.filter(_._2 != 0L))
  }

  test("the learned model recovers the planted signal far above chance") {
    val preds = SparkEntry.queries("t_classifier_train")(spark, sf)
      .collect()
    val acc = preds.count(r =>
      r.getAs[String]("pred") == r.getAs[String]("truth")).toDouble /
      preds.length
    val majority = math.max(
      preds.count(_.getAs[String]("truth") == "pos"),
      preds.count(_.getAs[String]("truth") == "neg")).toDouble /
      preds.length
    assert(acc >= 0.75, s"accuracy $acc")
    assert(acc > majority, s"accuracy $acc vs majority baseline $majority")
  }

  test("marker buckets carry the dominant learned weights") {
    val w = Classifier.trainOnlinePerceptron(engineSampleFeats, 3)
    assert(w.getOrElse(bucket("helpful"), 0L) > 0L)
    assert(w.getOrElse(bucket("insight"), 0L) > 0L)
    assert(w.getOrElse(bucket("clickbait"), 0L) < 0L)
  }

  test("the feature-row guard fires loud BEFORE any driver collect") {
    // 100 rows against a 10-row bound: the distributed count trips the
    // require — the collect (which would be the OOM at real scale)
    // never runs
    val feats = spark.range(100)
      .select(col("id").as("doc_id"), lit(1L).as("y"),
        (col("id") % 7).as("b"), lit(1L).as("c"))
    val ex = intercept[IllegalArgumentException] {
      Classifier.trainOnlinePerceptron(feats, 1,
        maxDocs = 1000, maxRows = 10L)
    }
    assert(ex.getMessage.contains("driver-collect bound"))
  }

  test("maxDocs caps membership to the smallest mixHash keys") {
    // the cap must behave exactly like hand-selecting the maxDocs
    // smallest (mixHash, doc_id) keys — the property that makes the
    // driver sample corpus-size-INDEPENDENT
    val n = 50L
    def feats = spark.range(n)
      .select(col("id").as("doc_id"),
        when(col("id") % 2 === 0, 1L).otherwise(-1L).as("y"),
        (col("id") % 5).as("b"), lit(1L).as("c"))
    def mh(id: Long) = (id * 2654435761L) % 4294967296L
    val keep = (0L until n).sortBy(id => (mh(id), id)).take(8)
    val manual = Classifier.trainOnlinePerceptron(
      feats.filter(col("doc_id").isin(keep: _*)), 2)
    val capped = Classifier.trainOnlinePerceptron(feats, 2, maxDocs = 8)
    assert(capped == manual)
    assert(capped.nonEmpty)
  }
}
