package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Projection, VectorOps}

/** JL-projection semantics beyond the oracle hash: the sign matrix is
  * genuinely mixed (distinct, balanced rows — a separable/linear hash
  * would collapse it toward rank one and destroy distance
  * preservation), the 1/√k scaling is unbiased in squared norm on the
  * real fixture, and pairwise distances survive within the JL band
  * k = 16 promises.
  */
class ProjectionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("sign matrix rows are distinct, non-anti-identical, and balanced") {
    val rows = (0 until Projection.OutDims).map(j =>
      (0 until Projection.InDims).map(i => Projection.signComponent(j, i)))
    assert(rows.distinct.size == rows.size, "duplicate sign rows")
    assert(rows.map(r => r.map(-_)).forall(neg => !rows.contains(neg)),
      "anti-identical sign rows")
    rows.foreach { r =>
      val pos = r.count(_ > 0)
      assert(pos >= 22 && pos <= 42, s"unbalanced row: $pos/+64")
    }
  }

  test("projection is unbiased in squared norm on the fixture " +
      "(mean ratio ~ 1) and every pair distance is within the JL band") {
    val e = Tables.spread(Tables.embeddings(spark, "/root/testdata/sf0.001"))
      .select(col("vec_id"),
        VectorOps.asDouble(col("embedding")).as("v"))
      .withColumn("p", Projection.project(col("v")))
      .limit(40)
    val vecs = e.collect().map { r =>
      (r.getSeq[Double](1).toArray, r.getSeq[Double](2).toArray)
    }
    def sq(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for {
      i <- vecs.indices; j <- vecs.indices if i < j
    } yield sq(vecs(i)._2, vecs(j)._2) / sq(vecs(i)._1, vecs(j)._1)
    val mean = ratios.sum / ratios.size
    assert(math.abs(mean - 1.0) < 0.15,
      s"squared-distance ratio mean $mean drifts from 1")
    // k=16 ⇒ ε ≈ √(8·ln n / k) is loose; assert the concrete band the
    // deterministic matrix achieves (observed [0.23, 2.47]) with margin
    // for fixture regeneration — the claim is "no collapse, no blowup",
    // unbiasedness is the mean assertion above
    assert(ratios.forall(r => r > 0.1 && r < 5.0),
      s"pair distortion outside [0.1, 5]: min=${ratios.min} max=${ratios.max}")
  }

  test("planted near-duplicate pairs SURVIVE projection (high projected " +
      "cosine) even though noise-floor top-k rankings do not — the " +
      "structure-vs-noise contract the audit documents") {
    // the fixture embeddings are isotropic noise (max pairwise cosine
    // ≈ 0.48), so plant the structure: 20 base vectors, each with a
    // lightly-perturbed twin (cosine > 0.95 by construction)
    val rnd = new scala.util.Random(5)
    def vec(): Array[Double] = Array.fill(64)(rnd.nextGaussian())
    val bases = Seq.tabulate(20)(i => (i.toLong, vec()))
    val twins = bases.map { case (i, v) =>
      (i + 100L, v.map(_ + 0.15 * rnd.nextGaussian()))
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val projected = (bases ++ twins).map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "v")
      .select(col("vec_id"), Projection.project(col("v")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .toMap
    bases.zip(twins).foreach { case ((i, v), (j, w)) =>
      val rawC = cos(v, w)
      assert(rawC > 0.9, s"construction check: raw cosine $rawC")
      val pc = cos(projected(i), projected(j))
      assert(pc > 0.6,
        s"pair ($i, $j): projected cosine $pc lost the planted dup")
    }
  }

  test("registered query emits k rows per vector, matching a local " +
      "recompute of the first vector") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("s_random_projection")(spark, d)
    val n = Tables.embeddings(spark, d).count()
    assert(out.count() == n * Projection.OutDims)
    val first = out.filter(col("vec_id") === 0)
      .orderBy("dim").select("proj").as[Double].collect()
    val v = Tables.embeddings(spark, d).filter(col("vec_id") === 0)
      .select(VectorOps.asDouble(col("embedding"))).as[Seq[Double]]
      .head().toArray
    val want = (0 until Projection.OutDims).map { j =>
      val dot = (0 until Projection.InDims)
        .map(i => v(i) * Projection.signComponent(j, i)).sum
      BigDecimal(dot / math.sqrt(Projection.OutDims.toDouble))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    first.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) <= 1e-4, s"got $g want $w")
    }
  }
}
