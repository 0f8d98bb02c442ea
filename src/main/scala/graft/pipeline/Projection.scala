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
    // ranking runs on the 1e-6-ROUNDED cosine (ties broken by nid):
    // the two engines compute the cosine by different formulas
    // (dot/(‖·‖‖·‖) here, list_cosine_similarity there), and an ulp
    // difference at the rank-10 boundary would flip the overlap counts
    // — the round-before-compare discipline applied to the ranking key
    // itself, not just the output
    val exact = topK(pairs.select(col("qid"), col("vec_id").as("nid"),
      round(VectorOps.dot(col("qv"), col("v")) /
        (sqrt(VectorOps.dot(col("qv"), col("qv"))) *
          sqrt(VectorOps.dot(col("v"), col("v")))), 6).as("c")))
    val proj = topK(pairs.select(col("qid"), col("vec_id").as("nid"),
      round(VectorOps.dot(col("qp"), col("p")) /
        (sqrt(VectorOps.dot(col("qp"), col("qp"))) *
          sqrt(VectorOps.dot(col("p"), col("p")))), 6).as("c")))
    val nCommon = exact.join(proj, Seq("qid", "nid"))
      .groupBy("qid").agg(count(lit(1)).as("n_common"))
    exact.groupBy("qid").agg(count(lit(1)).as("n_exact"))
      .join(nCommon, Seq("qid"), "left")
      .select(col("qid"), col("n_exact"),
        coalesce(col("n_common"), lit(0L)).as("n_common"))
      .orderBy("qid")
  }

  /** One-pass covariance stats for the embedding column via the native
    * [[graft.functions.CovSketch]] aggregate — the input to PCA,
    * whitening, and Mahalanobis-style outlier scoring. The distributed
    * work is ONE ObjectHashAggregate with map-side partials shuffling
    * ~17 KB buffers; everything after runs on the collected
    * (1 + d + d(d+1)/2)-double row (driver-bounded by construction —
    * the codebook discipline).
    */
  def covStats(s: SparkSession, d: String): Array[Double] =
    Tables.spread(Tables.embeddings(s, d))
      .agg(graft.functions.CovSketch.cov_sketch(
        VectorOps.asDouble(col("embedding")), InDims).as("st"))
      .head().getSeq[Double](0).toArray

  /** Leading eigenpair of the covariance by driver-side power iteration
    * (100 steps from the normalized ones vector — deterministic, no
    * RNG; sign fixed by making the largest-|loading| component
    * positive). The 64×64 eigenproblem is driver-trivial; the corpus
    * only ever feeds the one-pass covariance aggregate.
    */
  def pcaTop(stats: Array[Double], d: Int): (Array[Double], Double) = {
    val c = Array.ofDim[Double](d, d)
    graft.functions.CovSketch.covEntries(stats, d).foreach {
      case (i, j, v) => c(i)(j) = v; c(j)(i) = v
    }
    powerIter(c, d)
  }

  /** The same driver eigen step over a covariance QUANTIZED to the
    * 1e-6 grid — the oracle-graduation move proven by
    * `s_mahalanobis_diag`: both engines derive bit-identical matrices
    * (the grid `s_covariance`'s green rows pin), and from an identical
    * start every power step is the same IEEE multiply-add sequence
    * (matVec row-major ascending, squared-norm left-to-right), so the
    * 1e-6-rounded loadings agree exactly. Power iteration is also
    * CONTRACTIVE toward the dominant eigenvector — ulp noise decays
    * instead of compounding, which is what separates this from the
    * Gauss–Jordan inversion that keeps `s_mahalanobis` rows-only.
    */
  def pcaTopQuantized(entries: Seq[(Int, Int, Double)], d: Int)
      : (Array[Double], Double) = {
    val c = Array.ofDim[Double](d, d)
    entries.foreach { case (i, j, v) => c(i)(j) = v; c(j)(i) = v }
    powerIter(c, d)
  }

  private def powerIter(c: Array[Array[Double]], d: Int)
      : (Array[Double], Double) = {
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    def matVec(x: Array[Double]): Array[Double] = {
      val y = new Array[Double](d)
      var i = 0
      while (i < d) {
        var s = 0.0; var j = 0
        while (j < d) { s += c(i)(j) * x(j); j += 1 }
        y(i) = s; i += 1
      }
      y
    }
    for (_ <- 1 to 100) {
      val y = matVec(v)
      val n = math.sqrt(y.map(x => x * x).sum)
      v = y.map(_ / n)
    }
    val lambda = v.zip(matVec(v)).map { case (a, b) => a * b }.sum
    val k = v.indices.maxBy(i => math.abs(v(i)))
    if (v(k) < 0) v = v.map(-_)
    (v, lambda)
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble + 0.0

  /** Gauss–Jordan inverse with partial pivoting — deterministic (no
    * RNG, fixed elimination order), driver-side on the d×d covariance.
    * A tiny ridge (1e-9·I) guards rank deficiency from degenerate
    * fixtures; documented, not hidden — it perturbs scores at the 1e-7
    * level, far under the 1e-4 output grain.
    */
  def inverse(m0: Array[Array[Double]]): Array[Array[Double]] = {
    val d = m0.length
    val a = Array.tabulate(d, d)((i, j) =>
      m0(i)(j) + (if (i == j) 1e-9 else 0.0))
    val inv = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var col = 0
    while (col < d) {
      var piv = col
      var r = col + 1
      while (r < d) {
        if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r
        r += 1
      }
      val t = a(col); a(col) = a(piv); a(piv) = t
      val ti = inv(col); inv(col) = inv(piv); inv(piv) = ti
      val p = a(col)(col)
      require(math.abs(p) > 1e-300, s"singular at column $col")
      var j = 0
      while (j < d) { a(col)(j) /= p; inv(col)(j) /= p; j += 1 }
      var i = 0
      while (i < d) {
        if (i != col) {
          val f = a(i)(col)
          if (f != 0.0) {
            var k = 0
            while (k < d) {
              a(i)(k) -= f * a(col)(k)
              inv(i)(k) -= f * inv(col)(k)
              k += 1
            }
          }
        }
        i += 1
      }
      col += 1
    }
    inv
  }

  /** (μ, C⁻¹) from the covariance stats — the literal artifacts the
    * Mahalanobis query embeds into the plan, so per-row scoring is a
    * fused d² quadratic form with nothing random at runtime.
    */
  def mahalanobisArtifacts(stats: Array[Double],
      d: Int): (Array[Double], Array[Array[Double]]) = {
    val n = stats(0)
    require(n > 0,
      s"cov_sketch saw no rows of the declared dimension d=$d")
    val mu = Array.tabulate(d)(i => stats(1 + i) / n)
    val c = Array.ofDim[Double](d, d)
    graft.functions.CovSketch.covEntries(stats, d).foreach {
      case (i, j, v) => c(i)(j) = v; c(j)(i) = v
    }
    (mu, inverse(c))
  }

  /** Top-k embedding outliers by Mahalanobis distance — the
    * covariance-aware radius that catches vectors inflated along
    * LOW-variance directions a plain L2 norm misses (corrupt encoder
    * outputs, wrong-modality rows). One CovSketch pass for the stats,
    * then one scan scoring each row against the literal (μ, C⁻¹)
    * artifacts, top-k through the bounded heap.
    */
  def mahalanobisTop(embeddings: DataFrame, k: Int): DataFrame = {
    val dims = InDims
    val stats = embeddings
      .agg(graft.functions.CovSketch.cov_sketch(
        VectorOps.asDouble(col("embedding")), dims).as("st"))
      .head().getSeq[Double](0).toArray
    val (mu, inv) = mahalanobisArtifacts(stats, dims)
    val scored = scoreFrame(embeddings, mu, inv)
    graft.plans.TopKPerKey.topKPerKey(
      scored.withColumn("g", lit(0)),
      Seq("g"), Seq(("score", true), ("vec_id", false)), k)
      .select("vec_id", "score")
      .orderBy(col("score").desc, col("vec_id"))
  }

  /** Top-k outliers by DIAGONAL Mahalanobis distance — the
    * variance-normalized z-score radius Σ(xᵢ−μᵢ)²/σᵢ², the standard
    * large-scale approximation when the full C⁻¹ is overkill (it
    * catches per-dimension inflation; only CROSS-dimension structure
    * needs the full form). Unlike the full tier this one is
    * ORACLE-BACKED: μ and σ² are quantized to the 1e-6 grid BEFORE
    * scoring (the grid `s_covariance`'s green rows prove both engines
    * share for exactly these statistics), and the 64-term quadratic is
    * summed in fixed left-to-right dimension order in both engines, so
    * the 1e-4-rounded score is the same IEEE arithmetic everywhere.
    * Same plan shape as the full tier: one CovSketch aggregate, one
    * scoring scan against literal artifacts, bounded-heap top-k.
    */
  def mahalanobisDiagTop(embeddings: DataFrame, k: Int): DataFrame = {
    val dims = InDims
    val stats = embeddings
      .agg(graft.functions.CovSketch.cov_sketch(
        VectorOps.asDouble(col("embedding")), dims).as("st"))
      .head().getSeq[Double](0).toArray
    val n = stats(0)
    require(n > 0,
      s"cov_sketch saw no rows of the declared dimension d=$dims")
    val mu = Array.tabulate(dims)(i => r6(stats(1 + i) / n))
    val varD = graft.functions.CovSketch.covEntries(stats, dims)
      .collect { case (i, j, v) if i == j => (i, r6(v)) }.toMap
    (0 until dims).foreach(i => require(varD(i) > 0,
      s"dimension $i has zero quantized variance — a constant " +
        "column cannot be z-scored"))
    val v = VectorOps.asDouble(col("embedding"))
    val score = (0 until dims).map { i =>
      val c = element_at(v, i + 1) - lit(mu(i))
      c * c / lit(varD(i))
    }.reduce(_ + _)
    val scored = embeddings.select(col("vec_id"),
      round(score, 4).as("score"))
    graft.plans.TopKPerKey.topKPerKey(
      scored.withColumn("g", lit(0)),
      Seq("g"), Seq(("score", true), ("vec_id", false)), k)
      .select("vec_id", "score")
      .orderBy(col("score").desc, col("vec_id"))
  }

  /** (vec_id, score) for every row — the shared scoring stage. */
  def scoreFrame(embeddings: DataFrame, mu: Array[Double],
      inv: Array[Array[Double]]): DataFrame = {
    val muLit = array(mu.toSeq.map(lit(_)): _*)
    val cen = zip_with(VectorOps.asDouble(col("embedding")), muLit,
      (x, m) => x - m)
    val score = (0 until mu.length).map { i =>
      val row = array(inv(i).toSeq.map(lit(_)): _*)
      element_at(col("cen"), i + 1) * VectorOps.dot(col("cen"), row)
    }.reduce(_ + _)
    embeddings
      .select(col("vec_id"), cen.as("cen"))
      .select(col("vec_id"), round(score, 4).as("score"))
  }

  private def CovSketch_entries(s: SparkSession,
      d: String): Seq[(Int, Int, Double)] =
    graft.functions.CovSketch.covEntries(covStats(s, d), InDims)
      .map { case (i, j, c) => (i, j, r6(c)) }

  val queries: Map[String, Q] = Map(
    // upper-triangle covariance entries — full oracle (the aggregate's
    // sums replayed as plain SQL aggregations)
    "s_covariance" -> { (s, d) =>
      import s.implicits._
      CovSketch_entries(s, d).toDF("i", "j", "cov").orderBy("i", "j")
    },
    // leading principal component — ORACLE-BACKED since round 9: the
    // iteration runs on the 1e-6-QUANTIZED covariance (the exact grid
    // s_covariance's green rows prove both engines share), so the
    // DuckDB twin's recursive CTE replays the same IEEE multiply-add
    // sequence from the same literal start (see [[pcaTopQuantized]];
    // contraction is what makes the recursion safe where the w_cusum
    // fold was not). PcaSpec still pins the eigen residual +
    // invariants of the driver step on the raw-stats tier
    "s_pca_top" -> { (s, d) =>
      import s.implicits._
      val (v, lambda) = pcaTopQuantized(CovSketch_entries(s, d), InDims)
      v.zipWithIndex.map { case (x, i) => (i, r6(x), r6(lambda)) }
        .toSeq.toDF("dim", "loading", "eigval").orderBy("dim")
    },
    // full-covariance Mahalanobis gate — rows-only BY DESIGN, and the
    // boundary is sharp now that s_pca_top graduated: power iteration
    // is CONTRACTIVE (ulp noise decays toward the dominant
    // eigenvector, so a quantized-input recursion is engine-stable),
    // while Gauss–Jordan elimination is NOT — each of the 64 pivot
    // steps propagates rounding forward with nothing pulling it back,
    // and the partial-pivot argmax compares data-dependent floats
    // whose ties/near-ties may resolve differently per engine, after
    // which the two eliminations follow entirely different arithmetic
    // paths. Quantizing the INPUT cannot fix divergence created
    // inside the recursion itself, so a DuckDB inversion twin would
    // be comparator-fragile in exactly the way the other no-oracle
    // entries document. Coverage: s_covariance hash-checks the input,
    // PcaSpec pins scores against an exact in-memory recompute + the
    // low-variance-direction catch L2 misses, and s_mahalanobis_diag
    // is the oracle-backed member of the family (closed-form scoring,
    // no inversion)
    "s_mahalanobis" -> { (s, d) =>
      mahalanobisTop(Tables.spread(Tables.embeddings(s, d)), 20)
    },
    // diagonal Mahalanobis — the oracle-backed tier (see scaladoc)
    "s_mahalanobis_diag" -> { (s, d) =>
      mahalanobisDiagTop(Tables.spread(Tables.embeddings(s, d)), 20)
    },
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
       |      ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC,
       |        b.vec_id)
       |      AS rk
       |    FROM e a, e b WHERE a.vec_id < 5 AND b.vec_id <> a.vec_id)
       |  WHERE rk <= 10),
       |proj AS (
       |  SELECT qid, nid FROM (
       |    SELECT a.vec_id qid, b.vec_id nid, row_number() OVER (
       |      PARTITION BY a.vec_id
       |      ORDER BY round(list_cosine_similarity(a.p, b.p), 6) DESC,
       |        b.vec_id)
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

  /** DuckDB twin of [[mahalanobisDiagTop]]: μ/σ² re-derived and
    * rounded to the same 1e-6 grid, the quadratic summed as an
    * explicit left-associated 64-term chain so the float addition
    * order matches the engine's `reduce(_ + _)` term for term.
    */
  private def mahalanobisDiagOracleSql: String = {
    val terms = (1 to InDims).map(i =>
      s"(v[$i] - mus[$i]) * (v[$i] - mus[$i]) / vrs[$i]")
      .mkString("\n    + ")
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |x AS (
       |  SELECT vec_id, u.i AS i1, v[u.i] AS xi
       |  FROM e, unnest(range(1, ${InDims + 1})) u(i)),
       |st AS (
       |  SELECT i1, round(sum(xi) / count(*), 6) AS mu,
       |    round(sum(xi * xi) / count(*) -
       |      (sum(xi) / count(*)) * (sum(xi) / count(*)), 6) AS vr
       |  FROM x GROUP BY i1),
       |piv AS (
       |  SELECT list(mu ORDER BY i1) AS mus, list(vr ORDER BY i1) AS vrs
       |  FROM st),
       |sc AS (
       |  SELECT vec_id, round(
       |    $terms, 4) AS score
       |  FROM e, piv)
       |SELECT vec_id, score FROM (
       |  SELECT vec_id, score, row_number() OVER (
       |    ORDER BY score DESC, vec_id) AS rk FROM sc)
       |WHERE rk <= 20 ORDER BY score DESC, vec_id""".stripMargin
  }

  /** DuckDB twin of the quantized [[pcaTopQuantized]] tier: covariance
    * on the shared 1e-6 grid, then the 100-step power iteration as a
    * recursive CTE over a LIST(DOUBLE) state (the t_classifier_train
    * recursion pattern) — each step one matVec + normalize in the
    * engine's operation order, then the engine's sign fix (first
    * largest-|loading| component made positive). All literals CAST to
    * DOUBLE: a bare `0.125` is DECIMAL in DuckDB and would poison the
    * arithmetic (and trip the check_oracle DECIMAL128 fence).
    */
  private def pcaTopOracleSql: String =
    s"""WITH RECURSIVE e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |x AS (
       |  SELECT vec_id, u.i AS i1, v[u.i] AS xi
       |  FROM e, unnest(range(1, ${InDims + 1})) u(i)),
       |covf AS (
       |  SELECT a.i1 AS i, b.i1 AS j,
       |    round(sum(a.xi * b.xi) / count(*) -
       |      (sum(a.xi) / count(*)) * (sum(b.xi) / count(*)), 6) + 0.0
       |      AS c
       |  FROM x a JOIN x b ON a.vec_id = b.vec_id
       |  GROUP BY 1, 2),
       |cm AS (SELECT i, list(c ORDER BY j) AS r FROM covf GROUP BY i),
       |cl AS (SELECT list(r ORDER BY i) AS m FROM cm),
       |it(k, v) AS (
       |  SELECT 0, list_transform(range($InDims),
       |    q -> CAST(${1.0 / math.sqrt(InDims.toDouble)} AS DOUBLE))
       |  UNION ALL
       |  SELECT it.k + 1,
       |    list_transform(
       |      list_transform(cl.m, r -> list_dot_product(r, it.v)),
       |      t -> t / sqrt(list_dot_product(
       |        list_transform(cl.m, r -> list_dot_product(r, it.v)),
       |        list_transform(cl.m, r -> list_dot_product(r, it.v)))))
       |  FROM it, cl WHERE it.k < 100),
       |vf AS (SELECT v FROM it WHERE k = 100),
       |mv AS (SELECT list_transform(cl.m, r -> list_dot_product(r, vf.v))
       |         AS y
       |       FROM cl, vf),
       |lam AS (SELECT list_dot_product(vf.v, mv.y) AS l FROM vf, mv),
       |am AS (
       |  SELECT u.i AS am FROM vf, unnest(range(1, ${InDims + 1})) u(i)
       |  ORDER BY abs(vf.v[u.i]) DESC, u.i LIMIT 1),
       |sg AS (SELECT CASE WHEN vf.v[am.am] < 0 THEN CAST(-1.0 AS DOUBLE)
       |              ELSE CAST(1.0 AS DOUBLE) END AS s
       |       FROM vf, am)
       |SELECT CAST(u.i - 1 AS INT) AS dim,
       |  round(sg.s * vf.v[u.i], 6) + 0.0 AS loading,
       |  round(lam.l, 6) + 0.0 AS eigval
       |FROM vf, sg, lam, unnest(range(1, ${InDims + 1})) u(i)
       |ORDER BY dim""".stripMargin

  val oracles: Map[String, String] = Map(
    "s_random_projection" -> oracleSqlText,
    "s_pca_top" -> pcaTopOracleSql,
    "a_projection_recall" -> recallOracleSql,
    "s_mahalanobis_diag" -> mahalanobisDiagOracleSql,
    // the aggregate's sums replayed as plain SQL: cov = E[xy] − E[x]E[y]
    "s_covariance" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |x AS (
        |  SELECT vec_id, u.i AS i1, v[u.i] AS xi
        |  FROM e, unnest(range(1, 65)) u(i))
        |SELECT CAST(a.i1 - 1 AS INT) AS i, CAST(b.i1 - 1 AS INT) AS j,
        |  round(sum(a.xi * b.xi) / count(*) -
        |    (sum(a.xi) / count(*)) * (sum(b.xi) / count(*)), 6) + 0.0
        |    AS cov
        |FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i1 <= b.i1
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
