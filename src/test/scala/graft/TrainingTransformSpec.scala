package graft

import org.scalatest.funsuite.AnyFunSuite

/** The FIM and T5-span transforms must be LOSSLESS re-serializations:
  * reassembling the pieces reproduces the normalized token stream
  * exactly — the property that makes them training transforms rather
  * than corruptions of the corpus.
  */
class TrainingTransformSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  private val sf = "/root/testdata/sf0.001"

  private def norm(text: String): Seq[String] =
    text.split(" ").toSeq.filter(_.nonEmpty)

  test("FIM: prefix+middle+suffix is the exact token stream; middle non-empty") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = SparkEntry.queries("p_fim_split")(spark, sf).collect()
    assert(rows.length == docs.size)
    var applied = 0
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (p, m, x) = (r.getAs[String]("fim_prefix"),
        r.getAs[String]("fim_middle"), r.getAs[String]("fim_suffix"))
      assert(norm(p) ++ norm(m) ++ norm(x) == norm(docs(id)),
        s"doc $id: reassembly diverged")
      if (r.getAs[Long]("fim_applied") == 1L) {
        applied += 1
        assert(m.nonEmpty, s"doc $id: applied split with empty middle")
      } else assert(norm(docs(id)).size < 3)
      assert(r.getAs[String]("psm_text") ==
        s"<fim_prefix>$p<fim_suffix>$x<fim_middle>$m")
    }
    assert(applied > rows.length / 2, "fixture should mostly apply")
  }

  test("T5 spans: substituting targets back into the input reproduces the doc") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = SparkEntry.queries("p_span_corruption")(spark, sf).collect()
    val sentinel = "<extra_id_(\\d+)>".r
    var totalTokens = 0L
    var maskedTokens = 0L
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val orig = norm(docs(id))
      val input = norm(r.getAs[String]("input_text"))
      val target = r.getAs[String]("target_text")
      val nSpans = r.getAs[Long]("n_spans")
      // split the target into span token lists by sentinel
      val spans = scala.collection.mutable.Map.empty[Int, Seq[String]]
      if (target.nonEmpty) {
        val parts = target.split("<extra_id_").toSeq.filter(_.nonEmpty)
        parts.foreach { part =>
          val k = part.takeWhile(_ != '>').toInt
          spans(k) = norm(part.dropWhile(_ != '>').drop(1))
        }
      }
      assert(spans.size == nSpans, s"doc $id: sentinel count")
      // sentinels number 0..nSpans-1 and appear in order in the input
      assert(spans.keySet == (0 until nSpans.toInt).toSet, s"doc $id")
      val ks = input.collect { case sentinel(k) => k.toInt }
      assert(ks == ks.sorted && ks == (0 until nSpans.toInt).toList,
        s"doc $id: input sentinel order $ks")
      // every masked span is non-empty (a masked block always covers
      // at least one real position)
      spans.values.foreach(sp => assert(sp.nonEmpty, s"doc $id empty span"))
      // THE invariant: substitute spans back → the original stream
      val rebuilt = input.flatMap {
        case sentinel(k) => spans(k.toInt)
        case tok => Seq(tok)
      }
      assert(rebuilt == orig, s"doc $id: reconstruction diverged")
      totalTokens += orig.size
      maskedTokens += spans.values.map(_.size).sum
    }
    // ~15% design rate (0.6 gate x avg 2 of 8), loose band
    val rate = maskedTokens.toDouble / totalTokens
    assert(rate > 0.08 && rate < 0.25, s"mask rate $rate out of band")
  }

  test("both transforms are deterministic across runs") {
    val a1 = SparkEntry.queries("p_fim_split")(spark, sf).collect().toSeq
    val a2 = SparkEntry.queries("p_fim_split")(spark, sf).collect().toSeq
    assert(a1 == a2)
    val b1 = SparkEntry.queries("p_span_corruption")(spark, sf)
      .collect().toSeq
    val b2 = SparkEntry.queries("p_span_corruption")(spark, sf)
      .collect().toSeq
    assert(b1 == b2)
  }
}
