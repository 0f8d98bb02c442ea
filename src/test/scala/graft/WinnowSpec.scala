package graft

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Fingerprints

/** Winnowing fingerprint selection (Schleimer et al. 2003) vs an
  * independently-coded sequential reference, plus the paper's structural
  * guarantees the oracle hash can't localize: window density, substring
  * detection, and the rightmost-minimum tie rule.
  */
class WinnowSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Sequential reference: the textbook windowed scan. */
  private def reference(text: String, k: Int = 4, w: Int = 4)
      : Set[(Int, String)] = {
    val t = text.split(" ")
    if (t.length < k) return Set.empty
    val hs = (0 to t.length - k).map(p =>
      md5hex(t.slice(p, p + k).mkString(" ")))
    (w - 1 until hs.length).flatMap { e =>
      val win = (e - w + 1 to e).map(p => (hs(p), p))
      // smallest hash; ties to the RIGHTMOST position
      val minH = win.map(_._1).min
      val pos = win.filter(_._1 == minH).map(_._2).max
      Some((pos, hs(pos)))
    }.toSet
  }

  private def engine(texts: Seq[String]): Map[Long, Set[(Int, String)]] = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    Fingerprints.winnow(df).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rows) =>
        id -> rows.map(r =>
          (r.getAs[Int]("pos"), r.getAs[String]("fp"))).toSet
      }
  }

  test("engine equals the sequential reference on varied docs") {
    val docs = Seq(
      "a b c d e f g h i j k l m n o p",
      "the quick brown fox jumps over the lazy dog again and again",
      "x y z w x y z w x y z w x y z w", // heavy repetition → hash ties
      "one two three four five six seven")
    val got = engine(docs)
    docs.zipWithIndex.foreach { case (t, i) =>
      assert(got.getOrElse(i.toLong, Set.empty) == reference(t),
        s"doc $i mismatch")
    }
  }

  test("density: every full window contains at least one selection") {
    val t = "p q r s t u v w a b c d e f g h i j"
    val sel = reference(t).map(_._1)
    val n = t.split(" ").length - 4 + 1
    (3 until n).foreach { e =>
      assert((e - 3 to e).exists(sel.contains), s"window ending $e empty")
    }
    assert(engine(Seq(t))(0L).map(_._1) == sel)
  }

  test("detection: docs sharing a >= w+k-1-token run share a fingerprint") {
    val shared = "alpha beta gamma delta epsilon zeta eta" // 7 = 4+4-1
    val a = s"one two $shared nine ten"
    val b = s"completely different prefix words $shared and a tail"
    val got = engine(Seq(a, b))
    val fpsA = got(0L).map(_._2)
    val fpsB = got(1L).map(_._2)
    assert((fpsA intersect fpsB).nonEmpty)
  }

  test("rightmost-minimum tie rule on identical grams in one window") {
    // identical k-grams at every position: all hashes equal, so each
    // window must select its RIGHTMOST position
    val t = Seq.fill(10)("same").mkString(" ")
    val n = 10 - 4 + 1 // 7 gram positions, windows end at 3..6
    val expect = (3 until n).map(e => e).toSet // rightmost = window end
    assert(engine(Seq(t))(0L).map(_._1) == expect)
  }

  test("docs below k+w-1 tokens have no full window and are absent") {
    val got = engine(Seq("a b c d e f", "a b c")) // 6 and 3 tokens < 7
    assert(got.isEmpty)
  }

  test("fixture run is non-vacuous, deterministic, and density-bounded") {
    val q = SparkEntry.queries("d_winnow_fingerprint")(spark,
      "/root/testdata/sf0.001")
    val rows = q.collect()
    assert(rows.nonEmpty)
    assert(q.collect().toSeq == rows.toSeq) // deterministic rerun
    // selection is a sample: strictly fewer rows than gram positions
    val grams = Tables.documents(spark, "/root/testdata/sf0.001")
      .selectExpr("greatest(0, size(split(text, ' ')) - 3) n")
      .agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    assert(rows.length < grams)
  }
}
