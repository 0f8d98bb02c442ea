package graft

import org.scalatest.funsuite.AnyFunSuite

/** Soft-dedup weighting: the weight law, singleton semantics, and
  * consistency with the d_dup_clusters component machinery.
  */
class SoftDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]) = {
    val dir = java.nio.file.Files.createTempDirectory("sd_fix").toString
    rows.map { case (id, t) => (id, t, "en", "srcA", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    SparkEntry.queries("p_soft_dedup_weights")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_size"), r.getAs[Long]("weight_micro")))
      .toMap
  }

  test("a duplicated pair splits its weight; singletons keep 1e6") {
    val dup = "alpha beta gamma delta epsilon zeta"
    val got = run(Seq(
      (1L, dup), (2L, dup),
      (3L, "completely different words appear here now")))
    assert(got(1L) == ((2L, 500000L)))
    assert(got(2L) == ((2L, 500000L)))
    assert(got(3L) == ((1L, 1000000L)))
  }

  test("a 3-way cluster weights to 1e6 DIV 3 = 333333") {
    val dup = "one two three four five six seven"
    val got = run(Seq((1L, dup), (2L, dup), (3L, dup),
      (4L, "other content entirely unrelated to that")))
    assert(Seq(1L, 2L, 3L).forall(got(_) == ((3L, 333333L))))
    assert(got(4L) == ((1L, 1000000L)))
  }

  test("fixture: weights obey 1e6 DIV size and match d_dup_clusters") {
    val d = "/root/testdata/sf0.001"
    val w = SparkEntry.queries("p_soft_dedup_weights")(spark, d).collect()
    assert(w.length == 500) // every doc gets a weight
    assert(w.forall(r => r.getAs[Long]("weight_micro") ==
      1000000L / r.getAs[Long]("cluster_size")))
    // cluster sizes agree with the component query
    val cl = SparkEntry.queries("d_dup_clusters")(spark, d).collect()
      .groupBy(_.getAs[Long]("cluster")).view.mapValues(_.length).toMap
    val byDoc = SparkEntry.queries("d_dup_clusters")(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> cl(r.getAs[Long]("cluster")))
      .toMap
    w.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("cluster_size") == byDoc.getOrElse(id, 1))
    }
    // non-vacuous: the fixture contains at least one real cluster
    assert(w.exists(_.getAs[Long]("cluster_size") > 1L))
  }
}
