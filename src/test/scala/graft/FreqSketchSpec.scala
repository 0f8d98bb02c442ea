package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SketchAggregates

/** SpaceSaving frequent-items sketch: exactness below capacity,
  * overcount-only bound under sequential eviction, heavy-hitter
  * containment + error bounds under distributed merge, and the SQL
  * registration surface.
  */
class FreqSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  /** (item, trueCount) for a deliberately skewed stream: item i in 1..40
    * appears 41−i times (item 1 → 40×, item 40 → 1×), interleaved so
    * heavy items are spread through the stream, not front-loaded.
    */
  private def zipfish: Seq[Long] =
    (1 to 40).flatMap(i => Seq.fill(41 - i)(i.toLong))
      .zipWithIndex.sortBy { case (_, pos) => (pos * 2654435761L) % 997 }
      .map(_._1)

  private def sketch(items: Seq[Long], m: Int, parts: Int)
      : Map[Long, (Long, Long)] = {
    import spark.implicits._
    items.toDF("item").repartition(parts)
      .agg(SketchAggregates.freq_sketch(col("item"), m).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select("e.item", "e.count", "e.err")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
  }

  private lazy val exact: Map[Long, Long] =
    zipfish.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("below capacity the sketch is exact, err 0") {
    val got = sketch(zipfish, m = 64, parts = 4)
    assert(got.map { case (k, (c, _)) => k -> c } == exact)
    assert(got.values.forall(_._2 == 0L), "no eviction → no error")
  }

  test("sequential eviction: overcount-only, bounded by err") {
    val got = sketch(zipfish, m = 16, parts = 1)
    for ((k, (c, e)) <- got) {
      val t = exact(k)
      assert(c >= t, s"item $k undercounted: $c < $t")
      assert(c - t <= e, s"item $k error $e doesn't cover overcount ${c - t}")
    }
  }

  test("distributed merge keeps the true heavy hitters with valid bounds") {
    // the containment guarantee covers items with true count > n/m; the
    // zipfish tail (max 40) sits below it, so plant two genuine heavy
    // hitters above the threshold: n = 820+500 = 1320, n/m = 82.5 —
    // counts 300 and 200 are guaranteed survivors of any merge order
    val stream = zipfish ++
      (0 until 500).map(i => if (i % 5 < 3) 100L else 101L)
    val trueC = Map(100L -> 300L, 101L -> 200L)
    val got = sketch(stream, m = 16, parts = 4)
    for ((k, t) <- trueC) {
      assert(got.contains(k), s"heavy hitter $k evicted")
      val (c, e) = got(k)
      assert(t <= c + e && t >= c - e,
        s"item $k: true $t outside [${c - e}, ${c + e}]")
    }
    // and the two must rank top-2 by estimate
    val top2 = got.toSeq.sortBy { case (_, (c, _)) => -c }.take(2)
      .map(_._1).toSet
    assert(top2 == Set(100L, 101L), s"top-2 was $top2")
  }

  test("SQL surface: graft_freq_sketch registered, arity-checked") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    Seq(1L, 1L, 2L).toDF("x").createOrReplaceTempView("fs_in")
    val rows = spark.sql(
      "SELECT explode(graft_freq_sketch(x, 8)) e FROM fs_in")
      .select("e.item", "e.count").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(1L -> 2L, 2L -> 1L))
    val err = intercept[Exception] {
      spark.sql("SELECT graft_freq_sketch(x) FROM fs_in").collect()
    }
    assert(err.getMessage.contains("graft_freq_sketch"))
  }
}
