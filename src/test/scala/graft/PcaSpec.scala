package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CovSketch
import graft.pipeline.{Projection, VectorOps}

/** Covariance aggregate + PCA: the one-pass buffer must equal a hand
  * computation and be layout-independent; the power-iteration eigenpair
  * must recover a planted dominant direction on synthetic data and stay
  * a deterministic unit vector with a small residual on the fixture.
  */
class PcaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("cov buffer equals a hand computation and survives repartitioning") {
    val vecs = Seq(
      Array(1.0, 2.0, 3.0), Array(2.0, 4.0, 0.0),
      Array(0.0, 0.0, 6.0), Array(-1.0, 2.0, 3.0))
    val df = vecs.map(v => Tuple1(v.toSeq)).toDF("v")
    def stats(d: org.apache.spark.sql.DataFrame): Seq[(Int, Int, Double)] =
      CovSketch.covEntries(
        d.agg(CovSketch.cov_sketch(col("v"), 3).as("st"))
          .head().getSeq[Double](0).toArray, 3)
        .map { case (i, j, c) => (i, j,
          BigDecimal(c).setScale(9, BigDecimal.RoundingMode.HALF_UP)
            .toDouble) }
    val got = stats(df)
    // hand covariance: cov(i,j) = E[xi·xj] − E[xi]E[xj]
    val n = vecs.length.toDouble
    def mean(i: Int) = vecs.map(_(i)).sum / n
    def cov(i: Int, j: Int) =
      vecs.map(v => v(i) * v(j)).sum / n - mean(i) * mean(j)
    got.foreach { case (i, j, c) =>
      assert(math.abs(c - cov(i, j)) < 1e-9, s"cov($i,$j): $c")
    }
    assert(stats(df.repartition(7)) == got,
      "stats must be layout-independent at the rounding grain")
  }

  test("power iteration recovers a planted dominant direction") {
    val rnd = new scala.util.Random(3)
    val d = 16
    val u = Array.tabulate(d)(i => math.sin(i + 1.0))
    val un = math.sqrt(u.map(x => x * x).sum)
    val dir = u.map(_ / un)
    // x = α·g·dir + small noise, α >> noise ⇒ top eigvec ≈ dir
    val vecs = Seq.fill(400) {
      val g = rnd.nextGaussian() * 5.0
      Array.tabulate(d)(i => g * dir(i) + 0.1 * rnd.nextGaussian())
    }
    val df = vecs.map(v => Tuple1(v.toSeq)).toDF("v")
    val stats = df.agg(CovSketch.cov_sketch(col("v"), d).as("st"))
      .head().getSeq[Double](0).toArray
    val (v, lambda) = Projection.pcaTop(stats, d)
    val cos = v.zip(dir).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.99,
      s"planted direction not recovered: |cos| = ${math.abs(cos)}")
    assert(lambda > 20.0 && lambda < 30.0, // α² = 25 ± noise
      s"eigenvalue $lambda should approximate the planted variance 25")
  }

  test("fixture eigenpair: unit norm, sign convention, determinism, " +
      "residual bounded, eigenvalue at least the average eigenvalue") {
    val stats = Projection.covStats(spark, "/root/testdata/sf0.001")
    val (v, lambda) = Projection.pcaTop(stats, Projection.InDims)
    assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9)
    val k = v.indices.maxBy(i => math.abs(v(i)))
    assert(v(k) > 0, "sign convention: largest-|loading| positive")
    val (v2, l2) = Projection.pcaTop(stats, Projection.InDims)
    assert(v.toSeq == v2.toSeq && lambda == l2)
    // residual ‖Cv − λv‖ — isotropic-noise spectra converge slowly, so
    // the bound is generous but still excludes nonsense
    val c = Array.ofDim[Double](Projection.InDims, Projection.InDims)
    CovSketch.covEntries(stats, Projection.InDims).foreach {
      case (i, j, x) => c(i)(j) = x; c(j)(i) = x }
    val cv = c.map(row => row.zip(v).map { case (a, b) => a * b }.sum)
    val resid = math.sqrt(cv.zip(v)
      .map { case (a, b) => (a - lambda * b) * (a - lambda * b) }.sum)
    assert(resid < 0.5 * lambda, s"residual $resid vs λ=$lambda")
    val trace = (0 until Projection.InDims).map(i => c(i)(i)).sum
    assert(lambda >= trace / Projection.InDims,
      s"λ=$lambda below the average eigenvalue ${trace / 64}")
  }

  test("the covariance aggregate plans with map-side partials (the " +
      "registered query's frame is driver-local, so the gate lives here)") {
    val df = Tables.spread(Tables.embeddings(spark,
        "/root/testdata/sf0.001"))
      .agg(CovSketch.cov_sketch(
        VectorOps.asDouble(col("embedding")), 64).as("st"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_covsketch"),
      s"no map-side partial:\n${plan.take(800)}")
    assert(plan.contains("ObjectHashAggregate"))
  }

  test("mahalanobis scores match an exact in-memory recompute from the " +
      "same stats (bit-level: identical fold order), top-20 included") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("s_mahalanobis")(spark, d).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val stats = Projection.covStats(spark, d)
    val (mu, inv) = Projection.mahalanobisArtifacts(stats, 64)
    val vecs = Tables.embeddings(spark, d)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val want = vecs.map { case (id, x) =>
      val cen = Array.tabulate(64)(i => x(i) - mu(i))
      val score = (0 until 64).map { i =>
        var dp = 0.0; var j = 0
        while (j < 64) { dp += cen(j) * inv(i)(j); j += 1 }
        cen(i) * dp
      }.reduceLeft(_ + _)
      (id, BigDecimal(score).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(x => (-x._2, x._1)).take(20)
    assert(got.toSeq == want.toSeq)
  }

  test("diagonal mahalanobis matches an exact in-memory recompute from " +
      "quantized (mu, sigma^2) with the same left-to-right fold, and " +
      "catches a per-dimension inflation") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("s_mahalanobis_diag")(spark, d)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val stats = Projection.covStats(spark, d)
    val n = stats(0)
    val mu = Array.tabulate(64)(i => r6(stats(1 + i) / n))
    val vr = CovSketch.covEntries(stats, 64)
      .collect { case (i, j, v) if i == j => (i, r6(v)) }.toMap
    val vecs = Tables.embeddings(spark, d)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val want = vecs.map { case (id, x) =>
      val score = (0 until 64).map { i =>
        val c = x(i) - mu(i); c * c / vr(i)
      }.reduceLeft(_ + _)
      (id, BigDecimal(score).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(t => (-t._2, t._1)).take(20)
    assert(got.toSeq == want.toSeq)
    // a planted per-dimension inflation outranks everything
    val rnd = new scala.util.Random(17)
    val base = Seq.tabulate(200)(i =>
      (i.toLong, Array.tabulate(64)(_ => rnd.nextGaussian())))
    val outlier = (999L,
      Array.tabulate(64)(j => if (j == 7) 40.0 else 0.0))
    val df = (base :+ outlier)
      .map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
    val top = Projection.mahalanobisDiagTop(df, 3).collect()
    assert(top.head.getLong(0) == 999L,
      s"inflated dim must rank first: ${top.toSeq}")
  }

  test("mahalanobis catches a low-variance-direction outlier that a " +
      "plain L2 radius ranks as unremarkable") {
    val rnd = new scala.util.Random(9)
    val base = Seq.tabulate(300) { i =>
      val v = Array.tabulate(64)(j =>
        if (j == 63) 0.01 * rnd.nextGaussian() else rnd.nextGaussian())
      (i.toLong, v)
    }
    // the outlier: tiny everywhere EXCEPT a 1.0 kick along the
    // variance-0.0001 dimension — its L2 norm (~1) is far BELOW the
    // typical ~8 of its peers
    val outlier = (999L, Array.tabulate(64)(j => if (j == 63) 1.0 else 0.0))
    val df = (base :+ outlier)
      .map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
    val top = Projection.mahalanobisTop(df, 5).collect()
      .map(_.getLong(0))
    assert(top.head == 999L,
      s"low-variance outlier must rank first: ${top.toSeq}")
    val l2Top = df.select(col("vec_id"),
        VectorOps.dot(col("embedding"), col("embedding")).as("n2"))
      .orderBy(col("n2").desc).limit(50).collect().map(_.getLong(0))
    assert(!l2Top.contains(999L),
      "the same vector must look unremarkable to a plain L2 radius")
  }

  test("registered queries: covariance is symmetric-consistent and " +
      "pca loads one row per dim") {
    val d = "/root/testdata/sf0.001"
    val covRows = SparkEntry.queries("s_covariance")(spark, d).collect()
    assert(covRows.length == 64 * 65 / 2)
    val pca = SparkEntry.queries("s_pca_top")(spark, d).collect()
    assert(pca.length == 64)
    assert(pca.map(_.getDouble(2)).distinct.length == 1)
  }
}
