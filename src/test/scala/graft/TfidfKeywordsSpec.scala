package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TextAnalysis

/** Per-source tf-idf keyword extraction: the integer scoring law, df
  * semantics, tie-breaks and the k-cut pinned on a hand fixture; plan
  * shape and non-vacuity on the real fixture.
  */
class TfidfKeywordsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  test("hand fixture: rarity-weighted ranking, df across sources, k-cut") {
    import spark.implicits._
    // srcA: 'apple' ×3 unique to A; 'the' ×4 in every source.
    // srcB: 'banana' ×2 unique to B. srcC: common words only.
    val docs = Seq(
      (1L, "apple apple apple the the", "en", "srcA", 0L),
      (2L, "the the banana banana", "en", "srcB", 0L),
      (3L, "the the the the", "en", "srcC", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.createOrReplaceTempView("documents_fixture")
    // run the operator body against the fixture via the same code path
    val toks = docs.select(col("source"),
      explode(split(col("text"), " ")).as("word"))
    val tf = toks.groupBy("source", "word").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val nSrc = docs.agg(countDistinct(col("source")).as("n_src"))
    val scored = tf.join(df_, "word").crossJoin(broadcast(nSrc))
      .withColumn("score_micro", expr("tf * ((1000000 * n_src) DIV df)"))
      .select("source", "word", "tf", "df", "score_micro")
    val top = graft.plans.TopKPerKey.topKPerKey(scored,
      Seq("source"), Seq(("score_micro", true), ("word", false)), 5)
      .collect().map(r => (r.getAs[String]("source"),
        r.getAs[String]("word"), r.getAs[Long]("tf"),
        r.getAs[Long]("df"), r.getAs[Long]("score_micro"))).toSet
    // N=3. apple: tf 3, df 1 → 3·(3e6 div 1) = 9e6. the@srcA: tf 2, df 3
    // → 2·(3e6 div 3) = 2e6. banana: 2·3e6 = 6e6.
    assert(top.contains(("srcA", "apple", 3L, 1L, 9000000L)))
    assert(top.contains(("srcA", "the", 2L, 3L, 2000000L)))
    assert(top.contains(("srcB", "banana", 2L, 1L, 6000000L)))
    assert(top.contains(("srcC", "the", 4L, 3L, 4000000L)))
    // the source-unique word outranks the ubiquitous one despite lower tf
    val srcA = top.filter(_._1 == "srcA").toSeq.sortBy(-_._5)
    assert(srcA.head._2 == "apple")
  }

  test("fixture run: exactly <=5 rows per source, scores descending") {
    val q = SparkEntry.queries("t_tfidf_keywords")(spark,
      "/root/testdata/sf0.001")
    val rows = q.collect()
    assert(rows.nonEmpty)
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    assert(bySrc.values.forall(_.length <= 5))
    bySrc.values.foreach { rs =>
      val scores = rs.map(_.getAs[Long]("score_micro")).toSeq
      assert(scores == scores.sorted.reverse)
    }
    // every score obeys the integer law tf * ((1e6 * N) DIV df)
    val n = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(countDistinct(col("source"))).head().getLong(0)
    rows.foreach { r =>
      val expect = r.getAs[Long]("tf") *
        ((1000000L * n) / r.getAs[Long]("df"))
      assert(r.getAs[Long]("score_micro") == expect)
    }
  }

  test("plan: ranking runs through TopKPerKey, never a full sort") {
    val q = SparkEntry.queries("t_tfidf_keywords")(spark,
      "/root/testdata/sf0.001")
    val plan = q.queryExecution.executedPlan.toString()
    assert(plan.contains("TopKPerKey"))
    // the one Sort is the final presentation ORDER BY (range partitioning)
    val sortsBelowTopK = plan.linesIterator
      .dropWhile(!_.contains("TopKPerKey"))
      .count(l => l.contains("Sort ") && !l.contains("rangepartitioning"))
    assert(sortsBelowTopK == 0, "no sort may feed the top-k")
  }
}
