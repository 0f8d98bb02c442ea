package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Fingerprints, Similarity}

/** The adaptive-LSH sizing contract ([[Similarity.lshPlan]] — round 14,
  * VERDICT r13 top item): the width rule must reproduce the historical
  * fixture constants at fixture sizes, grow with the corpus, and —
  * pinned at TWO forced widths — must not trade recall when the width
  * grows, because [[Similarity.lshTables]] compensates with tables.
  */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  test("lshPlan reproduces the round-12 fixture constants and widens " +
      "with the corpus") {
    // dedup design point: 500- and 2000-vector corpora = 4 bits × 12
    // tables (the constants the fixture benches/oracles were built on)
    assert(Similarity.lshPlan(500, Fingerprints.EmbDupCos,
      Fingerprints.EmbDupRecall) === (4, 12))
    assert(Similarity.lshPlan(2000, Fingerprints.EmbDupCos,
      Fingerprints.EmbDupRecall) === (4, 12))
    // the 10× tier widens to 8 bits; tables hit the index-cost cap
    assert(Similarity.lshPlan(20000, Fingerprints.EmbDupCos,
      Fingerprints.EmbDupRecall) === (8, 16))
    // ANN design point: the historical 4 bits × 8 tables at fixture n
    assert(Similarity.lshPlan(500, Similarity.AnnCos,
      Similarity.AnnRecall) === (4, 8))
    assert(Similarity.lshPlan(2000, Similarity.AnnCos,
      Similarity.AnnRecall) === (4, 8))
    // monotone: more vectors never narrows the signature
    val widths = Seq(500L, 5000L, 50000L, 500000L).map(n =>
      Similarity.lshPlan(n, Fingerprints.EmbDupCos,
        Fingerprints.EmbDupRecall)._1)
    assert(widths === widths.sorted)
    // bounded: the clamps hold at the extremes
    assert(Similarity.lshPlan(1, Fingerprints.EmbDupCos,
      Fingerprints.EmbDupRecall)._1 === 4)
    assert(Similarity.lshPlan(Long.MaxValue, Fingerprints.EmbDupCos,
      Fingerprints.EmbDupRecall)._1 === 16)
  }

  test("embedding-LSH recall holds at BOTH widths when tables follow " +
      "lshTables — width adaptivity cannot silently trade recall") {
    val exact = SparkEntry.queries("d_embedding_dup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    for (bits <- Seq(4, 8)) {
      val tables = Similarity.lshTables(bits, Fingerprints.EmbDupCos,
        Fingerprints.EmbDupRecall)
      val got = Fingerprints.embeddingDupLsh(spark, sf,
          widthOverride = Some((bits, tables))).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = exact.count(got.contains).toDouble / exact.size
      assert(recall >= 0.5,
        s"width $bits ($tables tables): recall $recall over ${exact.size}")
      // precision stays 1.0 at any width: candidates are re-verified
      // with the exact dot > threshold predicate
      assert((got -- exact).isEmpty,
        s"width $bits produced a non-exact pair")
    }
  }

  test("HyperplaneSigs: codegen output is bit-identical to the " +
      "composed lshSignature columns; interpreted eval agrees; " +
      "null/length contract holds") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val vecs = Seq(
      1L -> Seq.tabulate(64)(i => math.sin(i + 1.0)),
      2L -> Seq.fill(64)(0.0), // every dot 0 → no bit set → sig 0
      3L -> Seq.tabulate(64)(i => if (i % 2 == 0) 1.0 else -1.0),
      4L -> Seq.tabulate(64)(i => 1e-12 * (32.0 - i)))
    val df = vecs.toDF("id", "v")
    val tables = 5; val bits = 7
    val nat = df.orderBy("id").select(
        graft.functions.HyperplaneSigs.hyperplane_sigs(
          col("v"), tables, bits, 64))
      .collect().map(_.getSeq[Int](0).toSeq).toSeq
    val composed = df.orderBy("id").select(
        array((0 until tables).map(t =>
          graft.pipeline.Similarity.lshSignature(col("v"), t, bits, 64))
          : _*))
      .collect().map(_.getSeq[Int](0).toSeq).toSeq
    assert(nat == composed)
    assert(nat(1) == Seq.fill(tables)(0)) // the zero vector
    // interpreted path: eval() on a Literal child walks nullSafeEval,
    // not the generated code — must agree with the DataFrame route
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    for (((_, v), i) <- vecs.zipWithIndex) {
      val lit = Literal.create(v, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType))
      val got = graft.functions.HyperplaneSigs(lit, tables, bits, 64)
        .eval(null).asInstanceOf[ArrayData].toIntArray().toSeq
      assert(got == nat(i), s"interpreted != codegen for vector $i")
    }
    // contract: null input → null; wrong length → null (corrupt input)
    assert(graft.functions.HyperplaneSigs(
      Literal.create(null, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType)), tables, bits, 64)
      .eval(null) == null)
    assert(Seq(Seq(1.0, 2.0)).toDF("v").select(
        graft.functions.HyperplaneSigs.hyperplane_sigs(
          col("v"), tables, bits, 64))
      .head().isNullAt(0))
  }

  test("lshTables compensation: per the collision model, wider " +
      "signatures need more tables for the same recall") {
    val t4 = Similarity.lshTables(4, Fingerprints.EmbDupCos,
      Fingerprints.EmbDupRecall)
    val t8 = Similarity.lshTables(8, Fingerprints.EmbDupCos,
      Fingerprints.EmbDupRecall)
    assert(t4 === 12) // the historical constant falls out of the model
    assert(t8 > t4)
  }
}
