package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Lloyd's k-means over an embedding column — the topic-bucketing /
  * corpus-curation primitive (cluster-then-sample, cluster-balanced
  * mixtures, semantic bucketing before per-bucket dedup). North-star
  * operator: the reference has no vector surface (SURVEY §2.8).
  *
  * Spark-first shape, the same contract MLlib's KMeans uses:
  *   - centroids live on the DRIVER (k·dim doubles — broadcast-side size
  *     class by construction) and reach executors as codegen'd literals;
  *   - one assignment pass per iteration is a single scan with NO
  *     shuffle (argmin over k literal score expressions);
  *   - the recompute is one `groupBy(cluster, pos).avg` whose map-side
  *     partial aggregation ships k·dim doubles per partition — the only
  *     shuffle, constant-size in the corpus.
  * At 100 TB nothing here grows with the data except the scans.
  *
  * Determinism contract (what makes the op oracle-checkable):
  *   - init = the embeddings of the k smallest `vec_id`s (no RNG);
  *   - argmin ties break toward the smaller cluster index;
  *   - recomputed centroids are rounded to 1e-6 with the explicit
  *     `floor(x·10⁶+0.5)/10⁶` half-up form, so the engine-dependent
  *     partial-aggregation ORDER of `avg` (last-ulp noise) can never
  *     flip a later assignment;
  *   - per-element arithmetic (dot products, squared norms) is
  *     SEQUENTIAL left-to-right double accumulation on both sides —
  *     [[graft.functions.ArrayDot]] is a sequential loop and DuckDB's
  *     `list_sum(list_transform(…))` was verified bit-exact against it.
  *   - empty clusters keep their previous centroid.
  */
object KMeansOps {
  type Q = (SparkSession, String) => DataFrame

  /** Squared-distance argmin against literal centroids. Per row,
    * argmin_j |v-c_j|² = argmin_j (|c_j|² - 2·v·c_j): |v|² is constant
    * across j and dropping it removes one dot product per row.
    */
  private def assignExpr(cents: Array[Array[Double]]): Column = {
    val scores = cents.toSeq.zipWithIndex.map { case (c, j) =>
      // sequential sum, same order as the SQL twin's list_sum
      var sumsq = 0.0
      c.foreach(x => sumsq += x * x)
      (j, lit(sumsq) - lit(2.0) *
        VectorOps.dot(col("v"), typedLit(c.toSeq)))
    }
    val best = scores.map(_._2).reduce(least(_, _))
    // foldRight: the earliest (smallest-index) cluster hitting the min
    // wins ties — mirrors the twin's ORDER BY score, k
    scores.foldRight(lit(-1L)) { case ((j, sc), acc) =>
      when(sc === best, lit(j.toLong)).otherwise(acc)
    }
  }

  /** (vec_id, cluster) after `iters` assignment passes with `iters - 1`
    * centroid recomputes between them (so `iters = 1` is pure
    * assignment against the deterministic seeds).
    */
  def kmeans(vecs: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters > 0, s"k=$k iters=$iters must be positive")
    val v = vecs
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
    // deterministic seeds: k smallest ids. TakeOrdered on the driver —
    // k rows, the same size class as the centroids themselves.
    var cents: Array[Array[Double]] = v.orderBy("vec_id").limit(k)
      .collect().map(_.getSeq[Double](1).toArray)
    require(cents.length == k, s"need ≥ $k vectors, got ${cents.length}")
    for (_ <- 1 until iters) {
      val assigned = v.withColumn("cluster", assignExpr(cents))
      // one constant-size shuffle: k·dim partial (sum, count) pairs per
      // partition after map-side combine
      val means = assigned
        .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cluster", "pos").agg(avg("x").as("m"))
        .collect()
      val next = cents.map(_.clone())
      means.foreach { r =>
        // explicit half-up at 1e-6 (see determinism contract)
        next(r.getLong(0).toInt)(r.getInt(1)) =
          math.floor(r.getDouble(2) * 1e6 + 0.5) / 1e6
      }
      cents = next // empty clusters kept their previous centroid
    }
    v.withColumn("cluster", assignExpr(cents)).select("vec_id", "cluster")
  }

  /** SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication", 2023): semantic dedup
    * as k-means bucketing + within-cluster cosine pruning. A vector is
    * dropped iff a SMALLER-id vector in the SAME semantic cluster has
    * cosine ≥ `tau` — the deterministic greedy form of the paper's
    * "keep one exemplar per duplicate set" (id order replaces its
    * arbitrary scan order, so the keep set is engine-reproducible).
    *
    * Scale shape: this is why the clustering exists — pair enumeration
    * is WITHIN-cluster only, so candidates are ~n²/k instead of n², and
    * the paper's own regime grows k with the corpus (clusters stay
    * roughly constant-sized; the per-cluster product is bounded the
    * same way cappedPairs bounds LSH buckets). Vectors are normalized
    * once (linear), each surviving candidate pair is a single codegen'd
    * dot product, and the verdict frame carries ids + booleans only —
    * which is also what makes the oracle float-robust: no float is ever
    * emitted, and the τ compare has measured fixture margin (the
    * d_embedding_dup threshold discipline).
    */
  def semDedup(vecs: DataFrame, k: Int, iters: Int,
      tau: Double): DataFrame = {
    val assigned = kmeans(vecs, k, iters)
    val v = vecs
      .select(col("vec_id"),
        VectorOps.normalized(VectorOps.asDouble(col("embedding"))).as("nv"))
      .join(assigned, "vec_id")
    val dropped = v.as("a").join(v.as("b"),
        col("a.cluster") === col("b.cluster") &&
          col("a.vec_id") < col("b.vec_id") &&
          VectorOps.dot(col("a.nv"), col("b.nv")) >= lit(tau))
      .select(col("b.vec_id").as("vec_id"))
      .distinct()
      .withColumn("is_dropped", lit(true))
    assigned.join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        coalesce(!col("is_dropped"), lit(true)).as("kept"))
  }

  /** Cluster-balanced sampling — the "cluster-then-sample" curation
    * move (DataComp / SemDeDup-adjacent): cap every semantic cluster
    * at `cap` members so one dominant topic cannot swamp the mix, the
    * embedding-space sibling of `p_domain_cap`'s per-source cap.
    * Member selection is the engine-portable hash-ranked rule
    * `p_stratified_sample` uses (row_number over md5(id) per cluster —
    * deterministic, partition-independent, no RNG), so the whole
    * keep/drop verdict is oracle-checkable on top of the unrolled
    * kmeans CTE. One cluster-keyed window over id-sized rows on top of
    * the kmeans scans; at 100 TB the window input is (id, cluster)
    * pairs only — text and vectors never reach the shuffle.
    */
  def clusterBalance(vecs: DataFrame, k: Int, iters: Int,
      cap: Int): DataFrame = {
    require(cap > 0, s"cap=$cap must be positive")
    val assigned = kmeans(vecs, k, iters)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster")
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
    assigned.withColumn("rk", row_number().over(w))
      .select(col("vec_id"), col("cluster"),
        (col("rk") <= cap).as("kept"))
  }

  val queries: Map[String, Q] = Map(
    // k=4, two assignment passes (one recompute) — small enough that the
    // DuckDB twin can unroll the iterations, real enough to exercise
    // seed-init, argmin, the rounded recompute, and re-assignment
    "s_kmeans" -> { (s, d) =>
      kmeans(Tables.spread(Tables.embeddings(s, d)), 4, 2)
        .orderBy("vec_id")
    },
    // SemDeDup over the same k=4/iters=2 deterministic clustering; τ
    // reuses d_embedding_dup's margin-proven 0.47, so the oracle is the
    // unrolled-kmeans CTE plus a within-cluster NOT-EXISTS
    "d_semdedup" -> { (s, d) =>
      semDedup(Tables.spread(Tables.embeddings(s, d)), 4, 2, 0.47)
        .orderBy("vec_id")
    },
    // per-cluster cap 50 over the same deterministic clustering — the
    // oracle is the kmeans CTE plus one hash-rank window
    "p_cluster_balance" -> { (s, d) =>
      clusterBalance(Tables.spread(Tables.embeddings(s, d)), 4, 2, 50)
        .orderBy("vec_id")
    })

  /** The unrolled k=4 / iters=2 Lloyd CTE chain (through `a2`) shared
    * by every kmeans-derived oracle — seed init, sequential-sum argmin,
    * the half-up 1e-6 recompute, re-assignment.
    */
  private val UnrolledKmeansCtes =
    """WITH v AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) e
      |  FROM embeddings),
      |c0 AS (
      |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) k,
      |         e AS ctr
      |  FROM v ORDER BY vec_id LIMIT 4),
      |s1 AS (
      |  SELECT vec_id, k,
      |    list_sum(list_transform(ctr, x -> x * x)) -
      |    2 * list_sum(list_transform(range(1, len(ctr) + 1),
      |                                i -> e[i] * ctr[i])) AS score
      |  FROM v CROSS JOIN c0),
      |a1 AS (
      |  SELECT vec_id, k,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY score, k) rn
      |  FROM s1),
      |asg1 AS (SELECT vec_id, k AS cluster FROM a1 WHERE rn = 1),
      |m1 AS (
      |  SELECT a.cluster, u.d,
      |    floor(avg(e[d]) * 1000000 + 0.5) / 1000000.0 AS m
      |  FROM asg1 a JOIN v USING (vec_id),
      |       unnest(range(1, len(e) + 1)) u(d)
      |  GROUP BY 1, 2),
      |c1 AS (
      |  SELECT c0.k, COALESCE(mm.ctr, c0.ctr) AS ctr
      |  FROM c0 LEFT JOIN
      |    (SELECT cluster AS k, list(m ORDER BY d) AS ctr
      |     FROM m1 GROUP BY 1) mm USING (k)),
      |s2 AS (
      |  SELECT vec_id, k,
      |    list_sum(list_transform(ctr, x -> x * x)) -
      |    2 * list_sum(list_transform(range(1, len(ctr) + 1),
      |                                i -> e[i] * ctr[i])) AS score
      |  FROM v CROSS JOIN c1),
      |a2 AS (
      |  SELECT vec_id, k,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY score, k) rn
      |  FROM s2)""".stripMargin

  val oracles: Map[String, String] = Map(
    "s_kmeans" -> (UnrolledKmeansCtes +
      """
        |SELECT vec_id, k AS cluster FROM a2 WHERE rn = 1
        |ORDER BY vec_id""".stripMargin),
    // the kmeans CTE plus one hash-rank window — the
    // p_stratified_sample selection rule keyed by cluster
    "p_cluster_balance" -> (UnrolledKmeansCtes +
      """,
        |asg AS (SELECT vec_id, k AS cluster FROM a2 WHERE rn = 1)
        |SELECT vec_id, cluster, rk <= 50 AS kept FROM (
        |  SELECT vec_id, cluster, row_number() OVER (
        |    PARTITION BY cluster
        |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
        |  FROM asg)
        |ORDER BY vec_id""".stripMargin),
    // the s_kmeans unrolled-iteration CTE verbatim through asg, then
    // the greedy id-order within-cluster drop rule
    "d_semdedup" -> (UnrolledKmeansCtes +
      """,
        |asg AS (SELECT vec_id, k AS cluster FROM a2 WHERE rn = 1),
        |dropped AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM embeddings a
        |  JOIN asg aa ON aa.vec_id = a.vec_id
        |  JOIN embeddings b ON a.vec_id < b.vec_id
        |  JOIN asg ab ON ab.vec_id = b.vec_id
        |              AND ab.cluster = aa.cluster
        |  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.47)
        |SELECT asg.vec_id, asg.cluster,
        |  (d.vec_id IS NULL) AS kept
        |FROM asg LEFT JOIN dropped d ON asg.vec_id = d.vec_id
        |ORDER BY asg.vec_id""".stripMargin))
}
