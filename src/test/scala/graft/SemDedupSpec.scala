package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.KMeansOps

/** SemDeDup semantics beyond the d_semdedup hash-match: the greedy
  * id-order drop rule against an independent driver recompute, the
  * guarantee that identical vectors always collapse, and that pruning
  * never crosses cluster lines.
  */
class SemDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("drop rule matches a driver recompute given the assignment") {
    val vecs = Tables.embeddings(spark, sf)
    val out = KMeansOps.semDedup(vecs, 4, 2, 0.47)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val cluster = out.map(r => r._1 -> r._2).toMap
    val raw = vecs.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / math.sqrt(na) / math.sqrt(nb)
    }
    val ids = raw.keys.toSeq.sorted
    var nDropped = 0
    for ((id, cl, kept) <- out) {
      val dominated = ids.exists(u => u < id && cluster(u) == cl &&
        cos(raw(u), raw(id)) >= 0.47)
      assert(kept == !dominated,
        s"vec $id: kept=$kept but dominated=$dominated")
      if (!kept) nDropped += 1
    }
    // the fixture plants near-dup embeddings; if none land within a
    // cluster the drop path is untested and this spec is vacuous
    assert(nDropped >= 1, "no vector dropped — vacuous fixture")
  }

  test("identical vectors always collapse to the smaller id") {
    // 8 mutually orthogonal one-hot axes (pairwise cos = 0, far under
    // τ) + exact duplicates of two of them — identical vectors assign
    // identically, so each dup shares its original's cluster and must
    // be the one dropped
    val base = (0L until 8L).map { i =>
      (i, Array.tabulate(8)(j => if (j == i.toInt) 1.0f else 0.0f).toSeq)
    }
    val dup = Seq((100L, base(3)._2), (101L, base(5)._2))
    val vecs = (base ++ dup).toDF("vec_id", "embedding")
    val out = KMeansOps.semDedup(vecs, 3, 2, 0.999)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(!out(100L) && !out(101L),
      "exact duplicate vectors must be dropped")
    assert(out(3L) && out(5L), "the smaller-id exemplar must survive")
  }

  test("pruning never crosses cluster lines") {
    // two identical PAIRS pushed to opposite corners: each pair shares
    // a cluster, the corners do not — so exactly one drop per pair
    val a = Array.fill(8)(1.0f).toSeq
    val b = Array.fill(8)(-1.0f).toSeq
    val vecs = Seq((1L, a), (2L, a), (3L, b), (4L, b))
      .toDF("vec_id", "embedding")
    val out = KMeansOps.semDedup(vecs, 2, 2, 0.9)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> true, 4L -> false))
  }
}
