package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Similarity

/** Margin-based pair mining (Artetxe & Schwenk 2019) vs an
  * independently-coded sequential reference, plus the property that
  * motivates the margin criterion: a "hub" vector close to everything
  * outranks a genuine pair under raw cosine but loses under margin.
  */
class MarginMiningSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def df(rows: Seq[(Long, Array[Float], Int)]) =
    rows.toDF("vec_id", "embedding", "label")

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    val (na, nb) = (math.sqrt(a.map(x => x * x.toDouble).sum),
      math.sqrt(b.map(x => x * x.toDouble).sum))
    a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum / (na * nb)
  }

  /** Sequential reference of the full margin pipeline (k-NN means as
    * explicit rank-ordered 4-term sums, ratio margin, top-3 per anchor).
    */
  private def reference(rows: Seq[(Long, Array[Float], Int)], k: Int = 4)
      : Seq[(Long, Long, Int)] = {
    val a = rows.filter(r => r._3 % 2 == 0 && r._1 < 40)
    val b = rows.filter(_._3 % 2 == 1)
    val c = (for (x <- a; y <- b if y._1 != x._1)
      yield ((x._1, y._1), cos(x._2, y._2))).toMap
    def knnMean(vals: Seq[Double]): Double =
      vals.sorted.reverse.take(k).reduceLeft(_ + _) / k
    val qpen = a.map(x => x._1 ->
      knnMean(b.filter(_._1 != x._1).map(y => c((x._1, y._1))))).toMap
    val npen = b.map(y => y._1 ->
      knnMean(a.filter(_._1 != y._1).map(x => c((x._1, y._1))))).toMap
    a.flatMap { x =>
      val ranked = b.filter(_._1 != x._1)
        .map(y => (y._1,
          c((x._1, y._1)) / ((qpen(x._1) + npen(y._1)) / 2)))
        .sortBy { case (nid, m) => (-m, nid) }
        .take(3).zipWithIndex
      ranked.map { case ((nid, _), i) => (x._1, nid, i + 1) }
    }
  }

  private val rnd = new scala.util.Random(7)
  private def randVec(): Array[Float] =
    Array.fill(16)((rnd.nextDouble() * 2 - 1).toFloat)

  test("engine equals the sequential reference on a random fixture") {
    val rows = (0L until 60L).map(i => (i, randVec(), (i % 10).toInt))
    val got = Similarity.marginMining(df(rows)).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"),
        r.getAs[Int]("rank"))).toSeq.sorted
    assert(got == reference(rows).sorted)
    assert(got.nonEmpty)
  }

  test("hub demotion: margin prefers the exclusive pair over the hub") {
    // anchors along distinct axes; a hub near ALL anchors; a true pair
    // near anchor 0 only. Cosine ranks the hub first for anchor 0;
    // margin divides the hub's score by its high kNN mean and flips it.
    def axis(i: Int, scale: Float = 1f): Array[Float] = {
      val v = Array.fill(16)(0f); v(i) = scale; v
    }
    val anchors = (0 until 4).map(i => (i.toLong * 2, axis(i), 0))
    val hub = Array.tabulate(16)(j => if (j < 4) 1f else 0f) // cos .5 to all
    // make the pair slightly WEAKER in raw cosine than the hub for a0:
    // cos(a0, hub) = 0.5; target cos(a0, pairV) just below 0.5
    val pairV = { val v = Array.fill(16)(0f); v(0) = 1f; v(15) = 1.8f; v }
    // cos(a0,pairV) = 1/sqrt(1+3.24) = 0.486 < 0.5
    val rows = anchors ++ Seq((101L, hub, 1), (103L, pairV, 1),
      (105L, axis(7), 1), (107L, axis(8), 1), (109L, axis(9), 1))
    // raw cosine top-1 for anchor 0 is the hub
    assert(cos(axis(0), hub) > cos(axis(0), pairV))
    val got = Similarity.marginMining(df(rows), k = 4).collect()
      .filter(_.getAs[Long]("qid") == 0L)
      .sortBy(_.getAs[Int]("rank"))
      .map(_.getAs[Long]("nid")).toSeq
    assert(got.head == 103L,
      s"margin must rank the exclusive pair first, got $got")
    // and the reference agrees end-to-end on this crafted fixture
    val ref = reference(rows).filter(_._1 == 0L).sortBy(_._3).map(_._2)
    assert(got == ref)
  }

  test("fixture run: 3 ranked rows per anchor, deterministic") {
    val q = SparkEntry.queries("s_margin_mining")(spark,
      "/root/testdata/sf0.001")
    val rows = q.collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.values.forall(_.map(_.getAs[Int]("rank")).sorted.toSeq
      == Seq(1, 2, 3)))
    assert(q.collect().toSeq == rows.toSeq)
  }

  test("plan: pair frame never sorts; ranking through TopKPerKey") {
    val q = SparkEntry.queries("s_margin_mining")(spark,
      "/root/testdata/sf0.001")
    val plan = q.queryExecution.executedPlan.toString()
    assert(plan.contains("TopKPerKey"))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), "anchor batch must broadcast")
  }
}
