package graft

import org.scalatest.funsuite.AnyFunSuite

/** SCD2 history semantics per change class: unchanged, edited-once,
  * edited-late, edited-twice, and deleted docs — and the partition
  * invariants on the real fixture.
  */
class Scd2Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def run(ids: Seq[Long]) = {
    val dir = java.nio.file.Files.createTempDirectory("scd_fix").toString
    ids.map(id => (id, s"stable content of doc $id", "en", "srcA", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    SparkEntry.queries("p_scd2_history")(spark, dir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("valid_from"))
        .map(r => (r.getAs[Int]("valid_from"), r.getAs[Int]("valid_to"),
          r.getAs[Boolean]("is_current"))).toSeq)
      .toMap
  }

  test("each change class produces its canonical run rows") {
    // 1: untouched; 7: v1 edit; 5: v2 edit; 35: both; 2 & 19: deleted
    val got = run(Seq(1L, 7L, 5L, 35L, 2L, 19L, 21L))
    assert(got(1L) == Seq((0, 2, true)))            // one run, still live
    assert(got(7L) == Seq((0, 0, false), (1, 2, true)))
    assert(got(5L) == Seq((0, 1, false), (2, 2, true)))
    assert(got(35L) == Seq((0, 0, false), (1, 1, false), (2, 2, true)))
    assert(got(2L) == Seq((0, 1, false)))           // deleted: run closes
    assert(got(19L) == Seq((0, 1, false)))
    assert(got(21L) == Seq((0, 0, false), (1, 2, true))) // %7 only
  }

  test("fixture invariants: contiguous version cover, one current row") {
    val rows = SparkEntry.queries("p_scd2_history")(spark,
      "/root/testdata/sf0.001").collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.size == 500)
    byDoc.foreach { case (id, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("valid_from"))
        .map(r => (r.getAs[Int]("valid_from"), r.getAs[Int]("valid_to"),
          r.getAs[Boolean]("is_current")))
      // ranges are well-formed, start at 0, and are contiguous
      assert(sorted.head._1 == 0)
      assert(sorted.forall(t => t._1 <= t._2))
      sorted.sliding(2).foreach { w =>
        if (w.length == 2) assert(w(1)._1 == w(0)._2 + 1, s"gap in doc $id")
      }
      val deleted = id % 17 == 2
      val lastTo = sorted.last._2
      assert(if (deleted) lastTo == 1 else lastTo == 2, s"doc $id tail")
      // exactly the final row of a live doc is current
      assert(sorted.count(_._3) == (if (deleted) 0 else 1))
      if (!deleted) assert(sorted.last._3)
    }
  }
}
