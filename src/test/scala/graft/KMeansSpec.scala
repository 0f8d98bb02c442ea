package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.KMeansOps

/** Accuracy and contract checks the SQL oracle can't express: cluster
  * quality against the fixture's latent labels, determinism across
  * runs, and the degenerate-input guards.
  */
class KMeansSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  /** The fixture's labels are only WEAKLY geometric: even supervised
    * nearest-label-centroid assignment scores 0.41 accuracy (within-label
    * mean cosine 0.0016 vs cross-label 0.0003 — measured), so label
    * purity is the wrong bar for the unsupervised algorithm. What k-means
    * guarantees is its OBJECTIVE: each Lloyd iteration is non-increasing
    * in within-cluster sum of squares. Pin that invariant, plus a purity
    * floor above the all-one-cluster baseline (max label share ≈ 0.118)
    * to show the faint structure is still being picked up — both values
    * are deterministic for the fixture (id-seeded init, no RNG).
    */
  test("k=10: Lloyd iterations are non-increasing in WCSS; purity beats " +
      "the one-cluster baseline") {
    val vecs = Tables.embeddings(spark, sf)
    def wcss(iters: Int): Double = {
      val a = KMeansOps.kmeans(vecs, 10, iters)
      val pts = vecs.select(col("vec_id"),
        graft.pipeline.VectorOps.asDouble(col("embedding")).as("v"))
        .join(a, "vec_id")
        .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
      // Σ (x - cluster-dim mean)² = Σx² - Σ c·mean² per (cluster, pos)
      pts.groupBy("cluster", "pos")
        .agg((sum(col("x") * col("x")) -
          count(lit(1)) * avg("x") * avg("x")).as("ss"))
        .agg(sum("ss")).head().getDouble(0)
    }
    val costs = Seq(1, 2, 4, 8).map(wcss)
    costs.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"WCSS rose across iterations: $costs")
    }
    val assigned = KMeansOps.kmeans(vecs, 10, 5)
      .join(vecs.select(col("vec_id"), col("label")), "vec_id")
    val n = assigned.count()
    val purity = assigned.groupBy("cluster", "label")
      .agg(count(lit(1)).as("c"))
      .groupBy("cluster").agg(max("c").as("m"))
      .agg(sum("m")).head().getLong(0).toDouble / n
    assert(purity >= 0.14,
      s"purity $purity under the above-baseline floor 0.14")
  }

  test("assignment is deterministic across runs") {
    val vecs = Tables.embeddings(spark, sf)
    val a = KMeansOps.kmeans(vecs, 4, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = KMeansOps.kmeans(vecs, 4, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)
  }

  test("iters=1 is pure assignment against the id-seeded centroids") {
    val vecs = Seq(
      (0L, Array(0f, 0f)), (1L, Array(10f, 10f)),
      (2L, Array(1f, 0f)), (3L, Array(9f, 10f)))
      .toDF("vec_id", "embedding")
    val got = KMeansOps.kmeans(vecs, 2, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // seeds = vecs 0 and 1; 2 is nearer seed 0, 3 nearer seed 1
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 0L, 3L -> 1L))
  }

  test("argmin ties break toward the smaller cluster index") {
    val vecs = Seq(
      (0L, Array(0f, 0f)), (1L, Array(2f, 0f)),
      (2L, Array(1f, 0f))) // equidistant from both seeds
      .toDF("vec_id", "embedding")
    val got = KMeansOps.kmeans(vecs, 2, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(2L) == 0L)
  }

  test("empty cluster keeps its previous centroid instead of crashing") {
    // vecs 0 and 1 coincide, so both seeds start at (3,3): every point
    // ties between the clusters and the smaller index wins them ALL —
    // cluster 1 is genuinely EMPTY in the recompute and must carry its
    // (3,3) centroid. A buggy carry-over (zeroed centroid) would hand
    // point 2 = (0,0) to cluster 1 on the next assignment pass.
    val vecs = Seq(
      (0L, Array(3f, 3f)), (1L, Array(3f, 3f)),
      (2L, Array(0f, 0f)), (3L, Array(6f, 6f)))
      .toDF("vec_id", "embedding")
    val got = KMeansOps.kmeans(vecs, 2, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.values.forall(_ == 0L),
      s"carried (3,3) centroid keeps every tie on cluster 0, got $got")
  }

  test("fewer vectors than k is a hard error, not a silent degenerate") {
    val vecs = Seq((0L, Array(0f, 0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      KMeansOps.kmeans(vecs, 2, 1)
    }
  }

  test("cluster balance: every cluster keeps exactly min(size, cap) " +
      "members, the verdict is partition-independent, and the cap " +
      "guard rejects zero") {
    val d = "/root/testdata/sf0.001"
    val vecs = Tables.spread(Tables.embeddings(spark, d))
    val got = KMeansOps.clusterBalance(vecs, 4, 2, 50)
    val byCluster = got.groupBy("cluster")
      .agg(count(lit(1)).as("n"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(byCluster.nonEmpty)
    byCluster.foreach { case (c, n, k) =>
      assert(k == math.min(n, 50L), s"cluster $c: $k kept of $n")
    }
    assert(byCluster.exists(_._2 > 50),
      "fixture must exercise the cap (some cluster over 50)")
    val a = got.orderBy("vec_id").collect().map(_.toString).toSeq
    val b = KMeansOps.clusterBalance(vecs.repartition(7), 4, 2, 50)
      .orderBy("vec_id").collect().map(_.toString).toSeq
    assert(a == b, "verdict must not depend on input partitioning")
    intercept[IllegalArgumentException] {
      KMeansOps.clusterBalance(vecs, 4, 2, 0)
    }
  }
}
