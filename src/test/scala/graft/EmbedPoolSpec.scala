package graft

import org.scalatest.funsuite.AnyFunSuite

/** Chunk→doc mean pooling: the exact mean law, partial-group semantics,
  * and output shape.
  */
class EmbedPoolSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  test("fixture: pooled values equal the driver-computed chunk means") {
    val d = "/root/testdata/sf0.001"
    val raw = Tables.embeddings(spark, d).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble))
    val expect = raw.groupBy(_._1 / 5).map { case (g, vs) =>
      val sorted = vs.sortBy(_._1).map(_._2)
      g -> (0 until 64).map { j =>
        // same explicit left fold as the operator
        sorted.map(_(j)).foldLeft(0.0)(_ + _) / sorted.size
      }
    }
    val got = SparkEntry.queries("s_embed_pool")(spark, d).collect()
    assert(got.length == expect.size * 64)
    got.foreach { r =>
      val g = r.getAs[Long]("group_id")
      val dim = r.getAs[Int]("dim")
      assert(r.getAs[Double]("pooled") == expect(g)(dim),
        s"group $g dim $dim") // EXACT: identical fold order
      assert(r.getAs[Long]("n_chunks") == 5L)
    }
  }

  test("partial groups average over the chunks present") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ep_fix").toString
    // group 0: chunks 0,1 only; values per dim: 1.0 and 3.0 → mean 2.0
    Seq((0L, Array.fill(64)(1.0f), 0), (1L, Array.fill(64)(3.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("s_embed_pool")(spark, dir).collect()
    assert(got.length == 64)
    got.foreach { r =>
      assert(r.getAs[Double]("pooled") == 2.0)
      assert(r.getAs[Long]("n_chunks") == 2L)
    }
  }
}
