package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QuantileSketch

/** Portable quantile sketch: the merge law (union of slice sketches ≡
  * one global pass), the accuracy contract (estimate ≤ exact ≤
  * estimate + bin width), and the integer grid edges.
  */
class QuantileSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val Bin = 1000L

  test("merge law: slice sketches union-merge to the global answer") {
    val li = Tables.lineitem(spark, sf)
    val global = QuantileSketch.quantiles(
      QuantileSketch.sketch(li, col("l_returnflag"),
        col("l_extendedprice"), Bin), Bin, Seq(50, 90, 99))
      .collect().map(_.toSeq).toSet
    // build one sketch per l_linestatus slice — different engines /
    // days / executors in miniature — and merge by plain union
    val slices = li.select("l_linestatus").distinct().collect()
      .map(_.getString(0))
    assert(slices.length >= 2, "fixture should have several slices")
    val merged = QuantileSketch.quantiles(
      slices.map(s0 => QuantileSketch.sketch(
        li.filter(col("l_linestatus") === s0), col("l_returnflag"),
        col("l_extendedprice"), Bin)).reduce(_.union(_)),
      Bin, Seq(50, 90, 99))
      .collect().map(_.toSeq).toSet
    assert(merged == global)
  }

  test("accuracy contract: estimate <= exact < estimate + bin width") {
    val li = Tables.lineitem(spark, sf)
    val est = QuantileSketch.quantiles(
      QuantileSketch.sketch(li, col("l_returnflag"),
        col("l_extendedprice"), Bin), Bin, Seq(50, 90, 99))
      .collect().map(r => r.getString(0) ->
        Seq(r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val exact = li.select(col("l_returnflag"),
        QuantileSketch.cents(col("l_extendedprice")).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, g) =>
        val sorted = g.map(_._2).sorted
        k -> Seq(50, 90, 99).map { q =>
          // the ceil(q·N/100)-th smallest value, 1-based
          sorted((q * sorted.length + 99) / 100 - 1)
        }
      }
    for ((k, es) <- est; (e, x) <- es.zip(exact(k))) {
      assert(e <= x && x < e + Bin, s"$k: estimate $e vs exact $x")
    }
  }

  test("grid edges: values on a bin boundary land in the upper bin") {
    // 10.00 → 1000 cents → bin 1 (boundary is inclusive-upper);
    // 9.99 → 999 cents → bin 0. (A decimal like 9.995 is NOT a grid
    // case: IEEE stores it below the half, both engines floor it to
    // 999 — the contract is engine-identity, not decimal intuition.)
    val df = Seq(("a", 10.00), ("a", 9.99)).toDF("k", "v")
    val sk = QuantileSketch.sketch(df, col("k"), col("v"), Bin)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(sk == Map(1L -> 1L, 0L -> 1L), s"got $sk")
  }

  test("negative values: bins floor, lower bound + width still bracket") {
    // −0.01 → −1 cents → bin −1 (floor), NOT bin 0: truncation toward
    // zero would give bin 0 a double width spanning (−Bin, +Bin) and
    // bin·Bin would exceed the value — the broken lower-bound case.
    val df = Seq(("n", -0.01), ("n", -10.00), ("n", -9.99), ("n", 0.00))
      .toDF("k", "v")
    val sk = QuantileSketch.sketch(df, col("k"), col("v"), Bin)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // cents: −1 → bin −1; −1000 → bin −1 (exact multiple floors to
    // itself); −999 → bin −1; 0 → bin 0
    assert(sk == Map(-1L -> 3L, 0L -> 1L), s"got $sk")
    // the accuracy contract holds on the negative axis too
    val est = QuantileSketch.quantiles(
      QuantileSketch.sketch(df, col("k"), col("v"), Bin), Bin, Seq(50, 99))
      .collect()(0)
    val sorted = Seq(-1000L, -999L, -1L, 0L)
    for ((q, i) <- Seq(50, 99).zipWithIndex) {
      val exact = sorted((q * sorted.length + 99) / 100 - 1)
      val e = est.getLong(2 + i)
      assert(e <= exact && exact < e + Bin, s"q$q: estimate $e vs $exact")
    }
  }

  test("single-row group: every quantile is that row's bin floor") {
    val df = Seq(("z", 12345.67)).toDF("k", "v")
    val q = QuantileSketch.quantiles(
      QuantileSketch.sketch(df, col("k"), col("v"), Bin), Bin,
      Seq(50, 99)).collect()(0)
    // 12345.67 → 1234567 cents → bin 1234 → 1234000
    assert(q.getLong(1) == 1L)
    assert(q.getLong(2) == 1234000L && q.getLong(3) == 1234000L)
  }
}
