package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Johnson–Lindenstrauss random projection — dimensionality reduction
  * for the embedding column (64 → 16 dims here) ahead of the ANN /
  * clustering / dedup tiers. A dense ±1 sign matrix (Achlioptas 2003:
  * Rademacher entries satisfy the JL distance-preservation lemma with
  * the same guarantees as Gaussians, and cost only adds/subtracts)
  * is generated from pure integer mixing — nothing random at runtime,
  * so the identical matrix is regenerated anywhere, any engine.
  *
  * Shape at 100 TB: embarrassingly per-row — the sign matrix rides the
  * closure as 16 small literal arrays (k·d doubles, broadcast-free),
  * each output dim is one codegen'd [[graft.functions.ArrayDot]]
  * against the stored vector, and the job is a single map stage with
  * zero shuffles (the registered query's ORDER BY is presentation
  * only). Downstream pair-heavy stages (SemDeDup, IVF coarse assign,
  * LSH banding) then run on k-dim vectors at k/d the flop and shuffle
  * byte cost, paying back the projection scan immediately.
  */
object Projection {
  type Q = (SparkSession, String) => DataFrame

  val OutDims = 16
  val InDims = 64

  /** Rademacher sign s(j, i) ∈ {−1, +1} for output dim j, input dim i
    * — splitmix-style avalanche over the index pair (same mixing
    * discipline as [[Similarity]]'s hyperplane family; the final bit
    * is well-mixed, unlike the parity of any LINEAR index combination,
    * which would factor the matrix to rank one).
    */
  def signComponent(j: Int, i: Int): Double = {
    var h = j * 8191L + i * 131L + 0x9E3779B97F4A7C15L
    h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL
    h ^= h >>> 33; h *= 0xC4CEB9FE1A85EC53L
    h ^= h >>> 33
    if (h >= 0) 1.0 else -1.0
  }

  /** k-dim projection of an `array<double>` column: out(j) =
    * dot(v, s(j, ·)) / sqrt(k) — the 1/√k scaling makes the MAP
    * unbiased in squared norm (E‖Pv‖² = ‖v‖²), so distance thresholds
    * tuned in the original space carry over.
    */
  def project(v: Column, k: Int = OutDims, d: Int = InDims): Column =
    array((0 until k).map { j =>
      val signs = array((0 until d).map(i => lit(signComponent(j, i))): _*)
      VectorOps.dot(v, signs) / math.sqrt(k.toDouble)
    }: _*)

  /** Projection-fidelity audit — JL recall as an oracle-checked RESULT
    * (the a_ann_recall discipline applied to the projection): per
    * query, how much of the exact 64-dim cosine top-10 survives when
    * ranking runs on the 16-dim projected vectors instead. Both sides
    * are deterministic arithmetic (the sign matrix is literals), so a
    * DuckDB twin replays project → rank → overlap and the counts
    * hash-match; the measured recall is what a user of the k/4-cost
    * tier actually trades away. On THIS fixture that is a lot (~1/10):
    * the vectors are isotropic noise, so "neighbors" are statistical
    * accidents separated by ~1/√d cosine gaps that 16 dims cannot
    * resolve — the documented worst case. What survives projection is
    * STRUCTURE: the planted near-duplicate pairs keep high projected
    * cosine (ProjectionSpec pins this), which is why the projection
    * tier fronts dedup/clustering, not noise-floor top-k ranking.
    */
  def projectionRecall(s: SparkSession, d: String): DataFrame = {
    val e = Tables.spread(Tables.embeddings(s, d))
      .select(col("vec_id"),
        VectorOps.asDouble(col("embedding")).as("v"))
      .withColumn("p", project(col("v")))
    def topK(scored: DataFrame): DataFrame =
      graft.plans.TopKPerKey.topKPerKey(scored, Seq("qid"),
        Seq(("c", true), ("nid", false)), 10).select("qid", "nid")
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("p").as("qp"))
    val pairs = e.join(broadcast(q), col("vec_id") =!= col("qid"))
    val exact = topK(pairs.select(col("qid"), col("vec_id").as("nid"),
      (VectorOps.dot(col("qv"), col("v")) /
        (sqrt(VectorOps.dot(col("qv"), col("qv"))) *
          sqrt(VectorOps.dot(col("v"), col("v"))))).as("c")))
    val proj = topK(pairs.select(col("qid"), col("vec_id").as("nid"),
      (VectorOps.dot(col("qp"), col("p")) /
        (sqrt(VectorOps.dot(col("qp"), col("qp"))) *
          sqrt(VectorOps.dot(col("p"), col("p"))))).as("c")))
    val nCommon = exact.join(proj, Seq("qid", "nid"))
      .groupBy("qid").agg(count(lit(1)).as("n_common"))
    exact.groupBy("qid").agg(count(lit(1)).as("n_exact"))
      .join(nCommon, Seq("qid"), "left")
      .select(col("qid"), col("n_exact"),
        coalesce(col("n_common"), lit(0L)).as("n_common"))
      .orderBy("qid")
  }

  val queries: Map[String, Q] = Map(
    "a_projection_recall" -> ((s, d) => projectionRecall(s, d)),
    // one row per (vec_id, output dim) so the oracle hash covers every
    // projected coordinate, not a summary of them
    "s_random_projection" -> { (s, d) =>
      Tables.spread(Tables.embeddings(s, d))
        .select(col("vec_id"),
          posexplode(project(VectorOps.asDouble(col("embedding")))))
        // + 0.0 normalizes IEEE −0.0 to +0.0 (both engines can round a
        // tiny negative to the zero of the opposite sign)
        .select(col("vec_id"), col("pos").as("dim"),
          (round(col("col"), 4) + lit(0.0)).as("proj"))
        .orderBy("vec_id", "dim")
    })

  private def signLit(j: Int): String =
    (0 until InDims).map(i => signComponent(j, i).toString)
      .mkString("[", ", ", "]")

  private def oracleSqlText: String = {
    val dims = (0 until OutDims).map { j =>
      s"  SELECT vec_id, $j AS dim, round(list_dot_product(v, " +
        s"${signLit(j)}) / sqrt(${OutDims}.0), 4) + 0.0 AS proj FROM e"
    }.mkString("\n  UNION ALL\n")
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
       |SELECT vec_id, dim, proj FROM (
       |$dims)
       |ORDER BY vec_id, dim""".stripMargin
  }

  /** DuckDB twin of [[projectionRecall]]: the identical literal sign
    * matrix projects every vector in SQL, both rankings replay, and
    * the overlap counts hash-match.
    */
  private def recallOracleSql: String = {
    val projList = (0 until OutDims).map(j =>
      s"list_dot_product(v, ${signLit(j)}) / sqrt(${OutDims}.0)")
      .mkString("[", ",\n    ", "]")
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |pe AS (
       |  SELECT vec_id,
       |    $projList AS p
       |  FROM e),
       |exact AS (
       |  SELECT qid, nid FROM (
       |    SELECT a.vec_id qid, b.vec_id nid, row_number() OVER (
       |      PARTITION BY a.vec_id
       |      ORDER BY list_cosine_similarity(a.v, b.v) DESC, b.vec_id)
       |      AS rk
       |    FROM e a, e b WHERE a.vec_id < 5 AND b.vec_id <> a.vec_id)
       |  WHERE rk <= 10),
       |proj AS (
       |  SELECT qid, nid FROM (
       |    SELECT a.vec_id qid, b.vec_id nid, row_number() OVER (
       |      PARTITION BY a.vec_id
       |      ORDER BY list_cosine_similarity(a.p, b.p) DESC, b.vec_id)
       |      AS rk
       |    FROM pe a, pe b WHERE a.vec_id < 5 AND b.vec_id <> a.vec_id)
       |  WHERE rk <= 10)
       |SELECT ec.qid, ec.n_exact, coalesce(cc.n_common, 0) AS n_common
       |FROM (SELECT qid, count(*) n_exact FROM exact GROUP BY qid) ec
       |LEFT JOIN (SELECT exact.qid, count(*) n_common
       |           FROM exact JOIN proj USING (qid, nid)
       |           GROUP BY exact.qid) cc USING (qid)
       |ORDER BY qid""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "s_random_projection" -> oracleSqlText,
    "a_projection_recall" -> recallOracleSql)
}
