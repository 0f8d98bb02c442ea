package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Calibration

/** Calibration eval: the floor-division law on negative scores, an
  * independent midrank-AUC reference, decile-structure invariants, and
  * the monotone reliability the synthesized truth is designed to show.
  */
class CalibrationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def docsDf(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "source", "text")

  test("s_micro uses floor division (negative weight sums included)") {
    import org.apache.spark.sql.functions.col
    // check the law on controlled fixtures whose ws sign varies: for
    // each, s_micro must equal floorDiv(1000*ws, n) with ws/n
    // re-derived through the same public scoring functions
    val fixtures = Seq("za zb zc", "the data join", "x", "#a #b #c #d")
      .zipWithIndex.map { case (t, i) => (i.toLong, "s", t) }
    val got = Calibration.scoredDocs(docsDf(fixtures)).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("s_micro")).toMap
    val refs = docsDf(fixtures)
      .select(col("doc_id"),
        graft.pipeline.TextAnalysis
          .hashClassifierWeightSum(col("text")).as("ws"),
        graft.pipeline.TextAnalysis.tokenCount(col("text"))
          .cast("long").as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(refs.exists(_._2 < 0) && refs.exists(_._2 > 0),
      s"fixture should cover both signs: ${refs.toSeq}")
    refs.foreach { case (id, ws, n) =>
      assert(got(id) == Math.floorDiv(1000L * ws, n),
        s"doc $id: ws=$ws n=$n")
    }
  }

  test("rankAuc equals an independent midrank Mann-Whitney reference") {
    val sc = Calibration.scoredDocs(
      graft.Tables.documents(spark, sf)).collect()
      .map(r => (r.getString(1), r.getAs[Long]("s_micro"),
        r.getBoolean(3)))
    val ref = sc.groupBy(_._1).map { case (src, rows) =>
      val sorted = rows.map(t => (t._2, t._3)).sortBy(_._1)
      // midranks: average 1-based rank per tied score value
      val withRank = sorted.zipWithIndex.map { case ((s, t), i) =>
        (s, t, i + 1L) }
      val mid = withRank.groupBy(_._1).map { case (s, g) =>
        s -> (g.map(_._3).min + g.map(_._3).max) }
      val nPos = sorted.count(_._2)
      val nNeg = sorted.length - nPos
      val sp2 = withRank.filter(_._2).map(r => mid(r._1)).sum
      src -> (if (nPos == 0 || nNeg == 0) None
        else Some((sp2 - nPos * (nPos + 1L)) * 1000000L /
          (2L * nPos * nNeg)))
    }
    val got = Calibration.rankAuc(
      graft.Tables.documents(spark, sf)).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got == ref, s"got $got vs $ref")
    // the synthesized truth tracks the score: every source is above
    // chance, and the corpus-level mean is clearly separated (sf0.001
    // sources hold ~50 docs each, so per-source AUC is noisy)
    assert(got.values.forall(_.exists(_ > 500000L)),
      s"AUC should beat chance everywhere: $got")
    val aucs = got.values.flatten
    assert(aucs.sum / aucs.size > 650000L,
      s"mean AUC should separate clearly: $got")
  }

  test("one-class source yields NULL AUC, not a crash") {
    // two docs with identical very positive text => both truth-positive
    val rows = Calibration.rankAuc(docsDf(Seq(
      (1L, "s", "the the the"), (2L, "s", "the the the")))).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getLong(1) + r.getLong(2) == 2L)
    assert(math.min(r.getLong(1), r.getLong(2)) == 0L)
    assert(r.isNullAt(3))
  }

  test("fleissKappa equals an independent in-memory reference and " +
      "sits above chance on the fixture") {
    val docs = graft.Tables.documents(spark, sf)
    val votes = Calibration.judgeVotes(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // structural: exactly 5 votes per item, categories in range
    val byItem = votes.groupBy(_._1)
    assert(byItem.values.forall(_.length == 5))
    assert(votes.forall(v => v._3 >= 0 && v._3 <= 2))
    // independent Fleiss computation on the integer grid
    val n = 5L
    val items = byItem.values.toSeq
    val pis = items.map { g =>
      val sq = g.groupBy(_._3).values.map(c => c.size.toLong *
        c.size).sum
      (sq - n) * 1000000L / (n * (n - 1))
    }
    val nItems = items.size.toLong
    val pbar = pis.sum / nItems
    val pks = votes.groupBy(_._3).values.map(g =>
      g.size.toLong * 1000000L / (nItems * n))
    val pe = pks.map(p => p * p).sum / 1000000L
    val kappa = (pbar - pe) * 1000000L / (1000000L - pe)
    val got = Calibration.fleissKappa(docs).collect()(0)
    assert(got.getLong(0) == nItems)
    assert(got.getLong(1) == pbar && got.getLong(2) == pe)
    assert(got.getLong(3) == kappa, s"kappa ${got.getLong(3)} vs $kappa")
    // 4-in-5 draws keep the base category: agreement well above chance
    assert(kappa > 300000L, s"kappa=$kappa should be well above 0")
    assert(kappa < 1000000L)
  }

  test("reliability: decile structure and monotone positive rate") {
    val rel = Calibration.reliability(
      graft.Tables.documents(spark, sf)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    val bySrc = rel.groupBy(_._1)
    for ((src, rows) <- bySrc) {
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to 10L), s"$src buckets")
      // ntile balance: sizes differ by at most 1
      val sizes = sorted.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$src sizes $sizes")
      // score ranges ordered and internally consistent
      sorted.foreach { r => assert(r._6 <= r._7, s"$src bounds $r") }
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a._7 <= b._6, s"$src bucket ranges overlap: $a vs $b")
      case _ => () }
      // the planted structure: the top decile is more positive than
      // the bottom one
      assert(sorted.last._5 > sorted.head._5,
        s"$src posrate not separated: ${sorted.map(_._5).toSeq}")
    }
  }
}
