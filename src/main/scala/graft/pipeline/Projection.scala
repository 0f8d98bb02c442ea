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

  val queries: Map[String, Q] = Map(
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

  private def oracleSqlText: String = {
    def signLit(j: Int): String =
      (0 until InDims).map(i => signComponent(j, i).toString)
        .mkString("[", ", ", "]")
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

  val oracles: Map[String, String] = Map(
    "s_random_projection" -> oracleSqlText)
}
