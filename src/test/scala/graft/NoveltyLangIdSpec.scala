package graft

import org.scalatest.funsuite.AnyFunSuite

/** Heaps'-law fit: β must hit its theoretical extremes on engineered
  * corpora (≈1 when every token is globally unique — vocabulary grows
  * with the corpus; ≈0 when the vocabulary is fixed — instant
  * saturation), and the fixture value must equal an independent
  * in-memory recompute of the cumulative log-log regression.
  */
class HeapsFitSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def beta(rows: Seq[(Long, String)]): Double = {
    val df = rows.toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
      .withColumn("n_chars", org.apache.spark.sql.functions.lit(1L))
    val dir = java.nio.file.Files.createTempDirectory("heaps").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // reuse the registered query against the synthetic dir: the other
    // tables aren't touched by t_heaps_fit
    SparkEntry.queries("t_heaps_fit")(spark, dir)
      .head().getDouble(0)
  }

  test("all-unique corpus fits beta ~ 1; fixed-vocab corpus ~ 0") {
    val unique = (1L to 40L).map(d =>
      (d, (1 to 20).map(k => s"u${d}x$k").mkString(" ")))
    assert(math.abs(beta(unique) - 1.0) < 0.01)
    val fixed = (1L to 40L).map(d => (d, "aa bb cc dd ee ff gg hh"))
    val b0 = beta(fixed)
    assert(b0 >= 0.0 && b0 < 0.05, s"fixed vocab must saturate: $b0")
  }

  test("fixture beta equals an in-memory recompute") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("t_heaps_fit")(spark, d).head()
    val docs = Tables.documents(spark, d)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val seen = scala.collection.mutable.Set.empty[String]
    var (cn, cv) = (0L, 0L)
    val xy = docs.map { case (_, t) =>
      val ws = t.split(" ")
      cn += ws.length
      ws.foreach(w => if (seen.add(w)) cv += 1)
      (math.log(cn.toDouble), math.log(cv.toDouble))
    }
    val m = xy.length.toDouble
    val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
    val sxy = xy.map(p => p._1 * p._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val b = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    assert(math.abs(got.getDouble(0) - b) < 1e-3)
    assert(got.getLong(2) == docs.length)
  }
}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-fixture semantics for t_ngram_novelty (first-occurrence
  * attribution in doc_id order) and t_charngram_langid (profile
  * training, argmax, tie and no-overlap edges).
  */
class NoveltyLangIdSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def run(name: String, rows: Seq[(Long, String, String)]) = {
    val dir = java.nio.file.Files.createTempDirectory("nl_fix").toString
    rows.map { case (id, t, l) => (id, t, l, "srcA", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    SparkEntry.queries(name)(spark, dir).collect()
  }

  test("novelty: a verbatim re-crawl scores zero; the original keeps 1e6") {
    val rows = Seq(
      (1L, "alpha beta gamma delta", "en"), // grams first seen here
      (2L, "alpha beta gamma delta", "en"), // exact re-crawl → 0 novel
      (3L, "alpha beta gamma other words here", "en")) // partial overlap
    val got = run("t_ngram_novelty", rows)
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel"),
          r.getAs[Long]("novelty_micro"))).toMap
    assert(got(1L) == ((2L, 2L, 1000000L)))
    assert(got(2L) == ((2L, 0L, 0L)))
    // doc3: grams = 4 distinct; 'alpha beta gamma' seen in doc1 → 3 novel
    assert(got(3L)._1 == 4L && got(3L)._2 == 3L)
    assert(got(3L)._3 == 1000000L * 3 / 4)
  }

  test("novelty: docs under 3 tokens are absent (no gram domain)") {
    val got = run("t_ngram_novelty", Seq((1L, "one two", "en"),
      (2L, "three four five six", "en")))
    assert(got.map(_.getAs[Long]("doc_id")).toSet == Set(2L))
  }

  test("charngram langid recovers labels with distinct scripts") {
    // three 'languages' with disjoint character inventories
    val rows = Seq.tabulate(9) { i =>
      val l = Seq("qq", "rr", "ss")(i % 3)
      val word = Seq("qqqq", "rrrr", "ssss")(i % 3)
      (i.toLong, Seq.fill(6)(word).mkString(" "), l)
    }
    val got = run("t_charngram_langid", rows)
    got.foreach { r =>
      assert(r.getAs[String]("predicted") == r.getAs[String]("labeled"))
    }
  }

  test("a doc too short to carry any trigram predicts 'und'") {
    val rows = Seq(
      (1L, Seq.fill(8)("qqqq").mkString(" "), "qq"),
      (2L, Seq.fill(8)("rrrr").mkString(" "), "rr"),
      (3L, "ab", "qq")) // 2 chars: no trigram, no profile overlap
    val got = run("t_charngram_langid", rows)
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted"))
      .toMap
    assert(got(1L) == "qq" && got(2L) == "rr")
    assert(got(3L) == "und")
  }

  test("a mixed-script doc resolves by majority overlap, not label") {
    // doc 3 labeled 'rr' but written mostly in qq-script: the qq profile
    // overlap (4 distinct grams) beats rr's — content wins over label,
    // which is the point of re-running lang-ID over a labeled crawl
    val rows = Seq(
      (1L, Seq.fill(8)("qqqq").mkString(" "), "qq"),
      (2L, Seq.fill(8)("rrrr").mkString(" "), "rr"),
      (3L, "qqqq qqqq qqqq", "rr"))
    val got = run("t_charngram_langid", rows)
    val p3 = got.find(_.getAs[Long]("doc_id") == 3L).get
      .getAs[String]("predicted")
    // doc 3's grams land in BOTH the qq profile and (via its own label
    // mass) the rr profile — equal distinct overlap either way, so the
    // deterministic tie rule (count DESC, lang ASC) must pick 'qq'
    assert(p3 == "qq", s"majority/tie resolution must yield qq, got $p3")
  }

  test("fixture runs are deterministic and complete") {
    val d = "/root/testdata/sf0.001"
    val n1 = SparkEntry.queries("t_ngram_novelty")(spark, d).collect()
    assert(n1.nonEmpty)
    // novelty is a fraction in [0, 1e6]
    assert(n1.forall { r =>
      val m = r.getAs[Long]("novelty_micro"); m >= 0L && m <= 1000000L })
    val l1 = SparkEntry.queries("t_charngram_langid")(spark, d).collect()
    assert(l1.length == 500)
    val l2 = SparkEntry.queries("t_charngram_langid")(spark, d).collect()
    assert(l1.toSeq == l2.toSeq)
  }

  test("trained variant equals the joined tier row-for-row on the fixture") {
    val d = "/root/testdata/sf0.001"
    val joined = SparkEntry.queries("t_charngram_langid")(spark, d)
      .collect().map(_.toSeq).toSeq
    val trained = SparkEntry.queries("t_charngram_langid_trained")(spark, d)
      .collect().map(_.toSeq).toSeq
    assert(trained == joined)
  }

  test("trained variant edges: 'und' on gramless docs, tie breaks lang ASC") {
    val got = run("t_charngram_langid_trained", Seq(
      (1L, Seq.fill(8)("qqqq").mkString(" "), "qq"),
      (2L, Seq.fill(8)("rrrr").mkString(" "), "rr"),
      (3L, "ab", "qq"), // no trigram → no overlap → und
      (4L, "qqqq qqqq qqqq", "rr"))) // equal overlap both ways → qq (ASC)
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted"))
      .toMap
    assert(got(1L) == "qq" && got(2L) == "rr")
    assert(got(3L) == "und")
    assert(got(4L) == "qq")
  }

  test("trained variant scores without a join or hash exchange") {
    // the model folds into the per-row expression: the scoring plan must
    // be scan → project → sort — no join, no hash repartitioning, at any
    // corpus size (the point of train-once/score-many)
    val df = SparkEntry.queries("t_charngram_langid_trained")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"scoring plan must not join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"scoring plan must not hash-shuffle:\n$plan")
  }
}
