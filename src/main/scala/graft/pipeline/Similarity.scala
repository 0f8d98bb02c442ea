package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Similarity search over the `embeddings` fixture (north star).
  *
  * Two tiers:
  *   - brute-force top-k: broadcast the (small) query batch against the
  *     corpus scan — exact, oracle-checked; one pass over the corpus, no
  *     corpus shuffle. This is how small query batches run even at 100 TB.
  *   - LSH-bucketed top-k: random-hyperplane signatures (deterministic,
  *     seed-derived planes), multi-table OR-amplification; candidates come
  *     from an equi-join on (table, bucket) — corpus cost is linear in
  *     matching buckets, not |corpus|×|queries|. Approximate → no SQL
  *     oracle; recall vs the brute-force tier is asserted in PipelineSpec.
  */
object Similarity {
  type Q = (SparkSession, String) => DataFrame

  /** s_ann_lsh design point (see [[lshPlan]]): the query batch wants
    * neighbors down to cos ≈ 0.40 with ~0.75 expected recall — at the
    * fixture sizes the rule yields the historical 8 tables × 4 bits.
    */
  val AnnCos = 0.40
  val AnnRecall = 0.74

  /** The ANN tier's QUERY-SIDE recall target once the table budget
    * caps out (r15 verdict #2: recall@10 at sf10 was 76% vs the 0.9
    * design target). Query-side probing is the cheap side — fan-out
    * multiplies k query rows, never the corpus — so the target is set
    * at the full 0.90 rather than the storage-constrained
    * [[AnnRecall]].
    */
  val AnnProbeRecall = 0.90

  /** Query-side flip radius for the scale ANN tier: the smallest depth
    * f such that probing EVERY bucket within Hamming ≤ f of the
    * query's home bucket reaches `targetRecall` under the Charikar
    * collision model. Probing the complete radius (all `Σ C(bits, j)`
    * masks, not a margin-ranked subset) makes the per-table collision
    * probability EXACTLY the Binomial CDF — a pair at the design
    * cosine disagrees per bit with q = θ/π, so
    *
    *   p_table(f) = P(Binom(bits, q) ≤ f),
    *   recall(f)  = 1 − (1 − p_table(f))^tables.
    *
    * At the sf10 plan (11 bits × 16 tables, cos 0.40): f = 1 models
    * 0.78, f = 2 models 0.94 → depth 2, 67 visits/table — 5 360 probe
    * rows for a 5-query batch, broadcast. Margin ranking is what the
    * DEDUP tier needs (its probing side is the full corpus, so depth
    * is rationed); a query batch can afford the whole radius, which
    * also makes the model exact instead of an upper bound.
    */
  def annQueryFlipDepth(bits: Int, tables: Int, cosThreshold: Double,
      targetRecall: Double, maxDepth: Int = 3): Int = {
    val q = math.acos(cosThreshold) / math.Pi
    def choose(n: Int, k: Int): Double =
      (0 until k).map(i => (n - i).toDouble / (i + 1)).product
    def pTable(f: Int): Double = (0 to f).map(j =>
      choose(bits, j) * math.pow(q, j) *
        math.pow(1.0 - q, (bits - j).toDouble)).sum
    (0 to maxDepth).find(f =>
      1.0 - math.pow(1.0 - pTable(f), tables.toDouble) >= targetRecall)
      .getOrElse(maxDepth)
  }

  /** All XOR masks of popcount ≤ depth over `bits` positions —
    * ascending, deterministic; mask 0 (the home bucket) included.
    */
  private[graft] def flipMasks(bits: Int, depth: Int): Seq[Int] =
    (0 until (1 << bits)).filter(m => Integer.bitCount(m) <= depth)

  /** Deterministic pseudo-random hyperplane component for (table, bit,
    * dim) — integer-hash → uniform in [-1, 1). Same value on every executor
    * with no RNG state (Date/Random are nondeterministic across retries).
    */
  private[graft] def planeComponent(table: Int, bit: Int, dim: Int): Double = {
    var h = table * 1000003L + bit * 8191L + dim * 131L + 0x9E3779B97F4A7C15L
    h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL
    h ^= h >>> 33; h *= 0xC4CEB9FE1A85EC53L
    h ^= h >>> 33
    (h.toDouble / Long.MaxValue.toDouble)
  }

  /** Uncapped table count for a target recall at a given signature width:
    * per-table collision for a pair at the design cosine is p^bits with
    * p = 1 − θ/π (random-hyperplane collision probability), and
    * OR-amplification over T independent tables recalls
    * 1 − (1 − p^bits)^T ≥ R  ⇔  T ≥ ln(1−R)/ln(1−p^bits).
    */
  def lshTables(bits: Int, cosThreshold: Double,
      targetRecall: Double): Int = {
    val p = 1.0 - math.acos(cosThreshold) / math.Pi
    val pb = math.pow(p, bits)
    math.max(1, math.ceil(math.log1p(-targetRecall) /
      math.log1p(-pb)).toInt)
  }

  /** LSH sizing rule — SCALING.md's "2^bits ∝ n / target bucket
    * occupancy" made code (round 13 carried it as prose only; the sf1
    * sweep showed the consequence: a 4-bit width fixed for the fixture
    * collapsed into the `cappedPairs` star tier at 10× vectors, 6.7×
    * wall-clock and ~10% recall).
    *
    *   bits   = clamp(⌈log₂(n / targetOccupancy)⌉, minBits, maxBits)
    *   tables = min(maxTables, [[lshTables]](bits, cos, R))
    *
    * Width follows the corpus so expected bucket occupancy (n / 2^bits
    * for near-uniform sign bits) stays O(targetOccupancy) — the
    * candidate-pair mass per table stays n·occ/2, linear in n, instead
    * of n²/2^(bits+1) at fixed width. Tables then buy recall back
    * (p^bits per table shrinks as bits grow); `maxTables` bounds the
    * index cost — the classic LSH n^(1+ρ) tradeoff surfaces HERE, as a
    * named cap whose effective recall is 1−(1−p^bits)^maxTables, not as
    * a silent bucket saturation. SimilaritySpec pins recall at two
    * widths with the uncapped table count so width adaptivity cannot
    * silently trade recall; the capped registry tier's reality is
    * measured by the recall audits (a_ann_recall, PipelineSpec).
    *
    * At the fixture sizes (n = 500 at sf0.001/sf0.01, n = 2000 at
    * sf0.1) the rule reproduces the round-12 constants exactly —
    * (4 bits, 12 tables) for the 0.47/0.90 dedup design point, (4, 8)
    * for the 0.40/0.74 ANN point — so plans, oracles, and benches at
    * those scales are unchanged; the 10× tier (n = 20000) moves to
    * 8-bit signatures.
    */
  def lshPlan(n: Long, cosThreshold: Double, targetRecall: Double,
      targetOccupancy: Long = 128, minBits: Int = 4, maxBits: Int = 16,
      maxTables: Int = 16): (Int, Int) = {
    val p = lshParams(n, cosThreshold, targetRecall, targetOccupancy,
      minBits, maxBits, maxTables)
    (p.bits, p.tables)
  }

  /** The full sizing triple: signature width, table count, and
    * multi-probe depth.
    */
  final case class LshParams(bits: Int, tables: Int, probes: Int)

  /** [[lshPlan]] extended with MULTI-PROBE depth — the r14 verdict's
    * top item. When [[lshTables]]' uncapped count exceeds `maxTables`,
    * the recall deficit used to be paid silently (effective recall
    * 1−(1−p^bits)^maxTables — ~2% at the dedup design point once
    * maxBits engages, n ≳ 8M vectors). Now the deficit is bought back
    * with probes: each vector/query also visits the buckets reachable
    * by flipping its `probes` lowest-|margin| sign bits
    * ([[graft.functions.HyperplaneProbeSigs]]) — the bits most likely
    * to disagree for a true near pair — so one stored table answers
    * like ≈(1+probes) tables (an upper bound: a probe bucket only
    * recovers pairs whose single disagreeing bit is among the flipped
    * ones; SimilaritySpec pins the measured recall ordering at two
    * widths × two probe depths, and the sf1/sf10 artifacts measure
    * pairs-found against the exact tier).
    *
    *   probes = clamp(⌈T_uncapped / maxTables⌉ − 1, 0, min(maxProbes,
    *            bits−1))
    *
    * Zero whenever the table budget covers the recall target — in
    * particular at EVERY fixture size (n ≤ 2048 ⇒ 4-bit plans, 8-12
    * tables ≤ 16), so fixture plans, oracles, and benches are unchanged
    * by construction; the 10× tier (n = 20k, 67 uncapped tables) gets
    * 4 probes, the 100× tier (n = 200k, ~240 uncapped) saturates
    * `maxProbes`. Probe rows multiply the PROBING side's frame by
    * (1+probes) but the stored index stays one row per (vector,
    * table) — the classic multi-probe trade of query fan-out for index
    * storage.
    */
  def lshParams(n: Long, cosThreshold: Double, targetRecall: Double,
      targetOccupancy: Long = 128, minBits: Int = 4, maxBits: Int = 16,
      maxTables: Int = 16, maxProbes: Int = 8): LshParams = {
    val raw = math.ceil(math.log(math.max(1.0,
      n.toDouble / targetOccupancy)) / math.log(2.0)).toInt
    val bits = math.min(maxBits, math.max(minBits, raw))
    val need = lshTables(bits, cosThreshold, targetRecall)
    val tables = math.min(maxTables, need)
    val probes = math.min(math.min(maxProbes, bits - 1), math.max(0,
      math.ceil(need.toDouble / maxTables).toInt - 1))
    LshParams(bits, tables, probes)
  }

  /** Screen budget for the sketch-screened verify cascade
    * ([[graft.functions.SigHamming]]): the largest signature Hamming
    * distance (over all `tables × bits` stored sign bits) a candidate
    * pair may show and still proceed to the exact-dot verify.
    *
    * Calculus (Charikar's estimator): a pair at exactly the design
    * cosine disagrees on each bit independently with probability
    * q = θ/π, so its Hamming distance over B = tables·bits total bits
    * is ~Binomial(B, q) — mean B·q, sd √(B·q(1−q)). The budget admits
    * `sigmas` standard deviations above the mean:
    *
    *   maxHamming = ⌈B·q + sigmas·√(B·q(1−q))⌉
    *
    * so a TRUE pair at the threshold is screened out with probability
    * ≈ Φ(−sigmas) (≈0.6% at 2.5σ; pairs above the threshold are
    * exponentially safer), while a RANDOM pair (q = ½) must land
    * (B/2 − maxHamming)/√(B/4) sds below ITS mean to survive — at the
    * sf10 plan (11 bits × 16 tables, B = 176) that is a ~17× cut of
    * the exact-verify candidate mass for a ~0.6% boundary recall tax.
    * At tiny fixture widths (B = 48) the screen is deliberately weak
    * (random pairs sit within a σ of the budget) — it is a SCALE
    * feature: its power grows with exactly the signature mass large
    * corpora already store.
    *
    * Deterministic integer from plan constants — the DuckDB twins bake
    * the same value and replay the screen as per-table
    * `bit_count(xor(...))` sums, so a screened tier stays hash-exact.
    */
  def screenMaxHamming(cosThreshold: Double, tables: Int, bits: Int,
      sigmas: Double = 2.5): Int = {
    val q = math.acos(cosThreshold) / math.Pi
    val b = tables.toDouble * bits
    math.ceil(b * q + sigmas * math.sqrt(b * q * (1.0 - q))).toInt
  }

  /** `bits`-wide signature per (vector, table): sign bits of dot(v,
    * plane). Built from literal plane arrays — fully codegen'd, nothing
    * random at runtime.
    */
  def lshSignature(v: Column, table: Int, bits: Int, dims: Int): Column = {
    val bitCols = (0 until bits).map { b =>
      val plane = array((0 until dims).map(i =>
        lit(planeComponent(table, b, i))): _*)
      when(VectorOps.dot(v, plane) > 0, 1 << b).otherwise(0)
    }
    bitCols.reduce(_ + _)
  }

  /** Top-k per query via the engine's own bounded-heap operator: the heavy
    * reduction (all candidates → k rows per qid) streams through
    * `TopKPerKey` with NO per-partition sort; the rank column is then a
    * window over only k·|queries| surviving rows. The previous
    * `row_number().over(Window)` formulation sorted every candidate.
    */
  private def topK(sims: DataFrame, k: Int): DataFrame = {
    val top = graft.plans.TopKPerKey.topKPerKey(
      sims.select(col("qid"), col("nid"), col("c")),
      Seq("qid"), Seq(("c", true), ("nid", false)), k)
    top.withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("c").desc, col("nid"))))
      .select(col("qid"), col("nid"), col("rank"))
      .orderBy("qid", "rank")
  }

  private lazy val exactAndLsh: Map[String, Q] = Map(
    // Exact brute-force cosine top-10 for 5 query vectors: broadcast the
    // query batch; single corpus scan, no shuffle of the corpus.
    "s_ann_bruteforce" -> { (s, d) =>
      val e = Tables.spread(Tables.embeddings(s, d))
        .select(col("vec_id"),
          VectorOps.normalized(VectorOps.asDouble(col("embedding"))).as("v"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      e.join(broadcast(q), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("nid"),
          VectorOps.dot(col("qv"), col("v")).as("c"))
        .transform(topK(_, 10))
    },
    // LSH-bucketed approximate top-10, sized by [[lshPlan]] at the
    // 0.40-cosine / 0.74-recall design point (at the fixture's n=500:
    // 8 tables × 4-bit signatures — θ(cos≈0.4)/π ≈ 0.37 ⇒ per-table
    // collision ≈ 0.63⁴ ≈ 0.16; 8-table OR-amplification ≈ 0.75
    // recall). Candidates = bucket-equality join, then exact cosine
    // re-rank. FULL oracle since round 14 ([[annLshOracle]] — the
    // hyperplanes are deterministic plan literals a_ann_recall's twin
    // has replayed green since round 5); recall vs brute force stays
    // spec-pinned in PipelineSpec. The sizing count is one
    // column-pruned parquet count — footer metadata, not a data scan.
    "s_ann_lsh" -> { (s, d) =>
      val dims = 64
      val n = Tables.embeddings(s, d).count()
      val pl = lshParams(n, AnnCos, AnnRecall)
      val (bits, tables, probes) = (pl.bits, pl.tables, pl.probes)
      val step = probes + 1
      val e = Tables.spread(Tables.embeddings(s, d))
        .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      // SCALE branch (probes > 0 ⇔ the table budget is capped — never
      // at fixture sizes, so fixture plans/oracles stay byte-identical
      // below): query-side flip-mask probing at the radius
      // [[annQueryFlipDepth]] models for the 0.90 target. The r15
      // single-bit margin probes measured 38/50 recall@10 at sf10;
      // probing the complete ≤f radius is affordable precisely because
      // only the k-row query batch fans out.
      if (probes > 0) annLshFlipMask(e, bits, tables, dims,
        annQueryFlipDepth(bits, tables, AnnCos, AnnProbeRecall))
      else annLshFixture(e, bits, tables, dims, probes, step)
    })

  /** The fixture-regime s_ann_lsh body (probe-0 at every fixture size;
    * kept verbatim so plans and the static oracle are unchanged).
    */
  private def annLshFixture(e0: DataFrame, bits: Int, tables: Int,
      dims: Int, probes: Int, step: Int): DataFrame = {
      val e = e0
      // all per-table signatures — home + multi-probe variants — in ONE
      // native expression + posexplode (pos DIV (1+probes) is the table
      // index, pos ≡ 0 mod (1+probes) the home row); the composed
      // per-table column form fell out of codegen at adaptive widths
      // (see HyperplaneSigs). The CORPUS side indexes home rows only —
      // multi-probe trades query-side fan-out for index storage, the
      // standard shape — while the QUERY side probes its `probes`
      // lowest-margin bit-flip buckets too. probes = 0 at every fixture
      // size, so plans/oracles there are byte-identical to round 14.
      val all = e.select(col("vec_id"),
        posexplode(graft.functions.HyperplaneSigs.hyperplane_probe_sigs(
          col("v"), tables, bits, dims, probes)).as(Seq("pos", "sig")))
        .select(col("vec_id"), expr(s"pos DIV $step").cast("int").as("t"),
          col("sig"), (pmod(col("pos"), lit(step)) === 0).as("home"))
      val sigs = all.filter(col("home")).drop("home")
      val q = all.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"),
          col("t").as("qt"), col("sig").as("qsig"))
      // id-pairs-only through the bucket join + dedup (array payloads
      // force a SortAggregate dedup; bare ids hash-aggregate), vectors
      // re-fetched after: corpus side by join, query side by broadcast
      val candidates = sigs
        .join(broadcast(q),
          col("t") === col("qt") && col("sig") === col("qsig") &&
            col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("nid"))
        .dropDuplicates("qid", "nid")
      val qv = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      candidates
        .join(e.select(col("vec_id").as("nid"), col("v")), "nid")
        .join(broadcast(qv), "qid")
        .select(col("qid"), col("nid"),
          VectorOps.cosine(col("qv"), col("v")).as("c"))
        .transform(topK(_, 10))
  }

  /** The SCALE s_ann_lsh body — complete-radius query-side probing
    * (private[graft] so SimilaritySpec can pin its recall ordering at
    * fixture scale, where the registered tier takes the probe-0
    * branch). Corpus side: HOME signatures only, from the bare
    * [[graft.functions.HyperplaneSigs.hyperplane_sigs]] pass — cheaper
    * than the probe expression, since probing moved entirely to the
    * query side. Query side: each of the k query rows visits every
    * bucket within Hamming ≤ `depth` of its home bucket — the
    * [[flipMasks]] XOR masks ride a literal array explode, so the key
    * frame is k · tables · ΣC(bits,j) rows of three ints, broadcast.
    * Exact-cosine re-rank over the candidate union as in every ANN
    * tier. Monotone: mask 0 makes the candidate set a superset of the
    * home-only tier's, and with exact re-rank the true-top-10 overlap
    * can only grow (a displaced candidate ranks below its displacer,
    * which ranks below the 10th true neighbor).
    */
  private[graft] def annLshFlipMask(e: DataFrame, bits: Int, tables: Int,
      dims: Int, depth: Int): DataFrame = {
    val masks = flipMasks(bits, depth)
    val sigs = e.select(col("vec_id"),
      posexplode(graft.functions.HyperplaneSigs.hyperplane_sigs(
        col("v"), tables, bits, dims)).as(Seq("t", "sig")))
    val q = sigs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("t").as("qt"),
        col("sig").as("hsig"))
      .select(col("qid"), col("qt"),
        explode(typedlit(masks)).as("mask"), col("hsig"))
      .select(col("qid"), col("qt"),
        col("hsig").bitwiseXOR(col("mask")).as("qsig"))
    val candidates = sigs
      .join(broadcast(q),
        col("t") === col("qt") && col("sig") === col("qsig") &&
          col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"))
      .dropDuplicates("qid", "nid")
    val qv = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    candidates
      .join(e.select(col("vec_id").as("nid"), col("v")), "nid")
      .join(broadcast(qv), "qid")
      .select(col("qid"), col("nid"),
        VectorOps.cosine(col("qv"), col("v")).as("c"))
      .transform(topK(_, 10))
  }

  /** Product-quantization ANN (the memory-bounded scale path: IVF bounds
    * WHICH vectors a query touches, PQ bounds what each touched vector
    * COSTS — m code bytes instead of 4·dims, so a 100 TB vector corpus's
    * index fits in executor memory where raw floats cannot).
    *
    * Shape: split each vector into `m` subvectors; per subspace, quantize
    * to the nearest of `k` codebook entries (the codebook here: subvector
    * slices of the same deterministic xxhash64-sampled corpus vectors the
    * IVF tier trains on). A query precomputes its m×k table of subspace
    * dot products ONCE, then every corpus vector scores as m table
    * lookups on its codes — asymmetric distance computation (ADC). The
    * ADC top-`shortlist` goes through exact re-rank, the standard
    * recall-restoring tail.
    *
    * Everything is column expressions over literal codebooks: encoding is
    * per-row argmin over k, no join, no UDF; the only shuffles are the
    * bounded TopKPerKey reductions. Approximate relative to brute
    * force (recall asserted in PipelineSpec) but DETERMINISTIC, so
    * since round 9 it carries a full oracle ([[annPqOracle]] — the
    * ivfpq twin minus the probe step).
    */
  private def pqQuery(s: SparkSession, d: String): DataFrame = {
    val dims = 64; val m = 8; val sub = dims / m
    val shortlist = 100
    val e = Tables.spread(Tables.embeddings(s, d))
      .select(col("vec_id"),
        VectorOps.normalized(VectorOps.asDouble(col("embedding"))).as("v"))
    // deterministic codebook sample, same trick as IVF: the k corpus
    // vectors with smallest mixHash(vec_id) — pure int64 arithmetic any
    // engine recomputes, unlike xxhash64 (see s_ann_ivf's oracle). k rows
    // to the driver — the same size class as a broadcast side, and the
    // codebook must become a plan LITERAL so encoding/ADC stay per-row
    // codegen expressions.
    val centRows = e
      .select(col("vec_id"), col("v"),
        TrainingSet.mixHash(col("vec_id")).as("h"))
      .orderBy(col("h"), col("vec_id")).limit(16)
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    // k follows what the corpus could supply: on a tiny input the
    // codebook is smaller than the nominal 16, and the argmin/ADC
    // transforms below must iterate only the entries that exist —
    // indexing a literal array past its end is an ANSI runtime error
    val k = centRows.length
    if (k == 0) return e.sparkSession.emptyDataFrame
      .select(lit(0L).as("qid"), lit(0L).as("nid"), lit(0).as("rank"))
      .limit(0)
    // codebook[j][c] = centroid c's j-th subvector; norms2[j][c] = its ‖·‖²
    val codebook: Seq[Seq[Seq[Double]]] = (0 until m).map(j =>
      centRows.toSeq.map(cv => cv.slice(j * sub, (j + 1) * sub).toSeq))
    val norms2: Seq[Seq[Double]] = codebook.map(_.map(cs =>
      cs.map(x => x * x).sum))
    val cbLit = typedlit(codebook)
    val n2Lit = typedlit(norms2)
    // dot(v[jsub..], codebook[j][c]) as a fold over the subspace dims
    def subDot(v: Column, j: Column, c: Column): Column =
      aggregate(sequence(lit(0), lit(sub - 1)), lit(0.0), (acc, i) =>
        acc + element_at(v, j * sub + i + 1) *
          element_at(element_at(element_at(cbLit, j + 1), c + 1), i + 1))
    // per-row encoding: code_j = argmin_c ‖v_j − c‖² = argmin_c (‖c‖² −
    // 2·v_j·c); array_position compares the min against its own array
    // element — the same double, so exact equality is safe
    val codes = transform(sequence(lit(0), lit(m - 1)), j => {
      val dists = transform(sequence(lit(0), lit(k - 1)), c =>
        element_at(element_at(n2Lit, j + 1), c + 1) -
          lit(2.0) * subDot(col("v"), j, c))
      (array_position(dists, array_min(dists)) - 1).cast("int")
    })
    val corpus = e.select(col("vec_id"), codes.as("codes"))
    // query side: the m×k ADC table, computed once per query row
    val qtab = transform(sequence(lit(0), lit(m - 1)), j =>
      transform(sequence(lit(0), lit(k - 1)), c =>
        subDot(col("qv"), j, c)))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
      .select(col("qid"), col("qv"), qtab.as("qtab"))
    // ADC score = Σ_j qtab[j][code_j] ≈ dot(q, v); m lookups per corpus row
    val approx = corpus.join(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"), col("qv"),
        aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, j) =>
          acc + element_at(element_at(col("qtab"), j + 1),
            element_at(col("codes"), j + 1) + 1)).as("adc"))
    // exact re-rank of the ADC shortlist: re-fetch true vectors by id
    val short = graft.plans.TopKPerKey.topKPerKey(
      approx.select(col("qid"), col("nid"), col("adc")),
      Seq("qid"), Seq(("adc", true), ("nid", false)), shortlist)
    short
      .join(e.select(col("vec_id").as("nid"), col("v")), "nid")
      .join(broadcast(q.select(col("qid"), col("qv"))), "qid")
      .select(col("qid"), col("nid"),
        VectorOps.dot(col("qv"), col("v")).as("c"))
      .transform(topK(_, 10))
  }

  /** IVF-PQ combined tier — the FAISS-standard 100 TB ANN shape: IVF
    * bounds WHICH vectors a query touches (probe the top-10 of 16
    * cells), PQ bounds what each touched vector COSTS (ADC table
    * lookups on m=8 code bytes instead of a 64-float dot), and the
    * ADC top-`shortlist` goes through exact re-rank. Composes the two
    * existing tiers' machinery — the mixHash centroid sample collected
    * to plan literals, per-row argmax cell assignment, per-row argmin
    * PQ encoding, broadcast probe join — so the corpus is never
    * cross-joined or windowed: one assignment+encode scan, one
    * cell-equi-join, two bounded-heap reductions.
    *
    * Carries a FULL oracle (as does the standalone PQ tier since
    * round 9): every step is deterministic double/int arithmetic
    * (mixHash sample, left-to-right subspace dots, integer-id tie
    * breaks, an EXPLICIT 8-term ADC addition chain matching the fold
    * order), so DuckDB replays sample → assign → encode → probe → ADC
    * → shortlist → re-rank and must reproduce (qid, nid, rank)
    * bit-for-bit.
    */
  private def ivfpqQuery(s: SparkSession, d: String): DataFrame = {
    val dims = 64; val m = 8; val sub = dims / m
    val shortlist = 60
    val e = Tables.spread(Tables.embeddings(s, d))
      .select(col("vec_id"),
        VectorOps.normalized(VectorOps.asDouble(col("embedding"))).as("v"))
    val centRows = e
      .select(col("vec_id"), col("v"),
        TrainingSet.mixHash(col("vec_id")).as("h"))
      .orderBy(col("h"), col("vec_id")).limit(16)
      .select("v").collect().map(_.getSeq[Double](0).toSeq).toSeq
    val k = centRows.length
    if (k == 0) return e.sparkSession.emptyDataFrame
      .select(lit(0L).as("qid"), lit(0L).as("nid"), lit(0).as("rank"))
      .limit(0)
    val cbFull = typedlit(centRows)
    val codebook: Seq[Seq[Seq[Double]]] = (0 until m).map(j =>
      centRows.map(cv => cv.slice(j * sub, (j + 1) * sub)))
    val norms2: Seq[Seq[Double]] = codebook.map(_.map(cs =>
      cs.map(x => x * x).sum))
    val cbLit = typedlit(codebook)
    val n2Lit = typedlit(norms2)
    def subDot(v: Column, j: Column, c: Column): Column =
      aggregate(sequence(lit(0), lit(sub - 1)), lit(0.0), (acc, i) =>
        acc + element_at(v, j * sub + i + 1) *
          element_at(element_at(element_at(cbLit, j + 1), c + 1), i + 1))
    val dots = transform(sequence(lit(0), lit(k - 1)), c =>
      VectorOps.dot(col("v"), element_at(cbFull, c + 1)))
    val codes = transform(sequence(lit(0), lit(m - 1)), j => {
      val dists = transform(sequence(lit(0), lit(k - 1)), c =>
        element_at(element_at(n2Lit, j + 1), c + 1) -
          lit(2.0) * subDot(col("v"), j, c))
      (array_position(dists, array_min(dists)) - 1).cast("int")
    })
    val assigned = e.withColumn("dots", dots)
      .select(col("vec_id"),
        (array_position(col("dots"), array_max(col("dots"))) - 1)
          .cast("int").as("cell"),
        codes.as("codes"))
    val probeCells = slice(array_sort(
      transform(sequence(lit(0), lit(k - 1)), c =>
        struct((-element_at(col("dots"), c + 1)).as("nd"),
          c.as("cid")))), 1, math.min(10, k))
    val qtab = transform(sequence(lit(0), lit(m - 1)), j =>
      transform(sequence(lit(0), lit(k - 1)), c =>
        subDot(col("qv"), j, c)))
    val probes = e.filter(col("vec_id") < 5)
      .withColumn("dots", dots)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        explode(transform(probeCells, x => x.getField("cid"))).as("cell"))
      .withColumn("qtab", qtab)
    val cand = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, j) =>
          acc + element_at(element_at(col("qtab"), j + 1),
            element_at(col("codes"), j + 1) + 1)).as("adc"))
    val short = graft.plans.TopKPerKey.topKPerKey(cand,
      Seq("qid"), Seq(("adc", true), ("nid", false)), shortlist)
    short
      .join(e.select(col("vec_id").as("nid"), col("v")), "nid")
      .join(broadcast(e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"))), "qid")
      .select(col("qid"), col("nid"),
        VectorOps.dot(col("qv"), col("v")).as("c"))
      .transform(topK(_, 10))
  }

  /** Int8 scalar quantization of the embedding corpus (FAISS SQ8 — the
    * serving-memory lever BEFORE structure tricks: 4× smaller than
    * float32 with near-lossless recall, composable under IVF/PQ).
    * Per-dimension affine map: q = floor((x − min_j)·255/(max_j −
    * min_j)), clamped to 255 at the top edge because a·255/a is not
    * exactly 255.0 in floating point.
    *
    * Scale shape: the per-dim min/max table is ONE dims-bounded
    * aggregate (64 rows — the driver-artifact class, collected to plan
    * literals like the IVF centroids), then quantization is a per-row
    * codegen'd transform: scan throughput at any corpus size. Exact
    * oracle: min/max are order-independent SELECTIONS of existing float
    * values and the affine arithmetic is the same correctly-rounded
    * double ops in both engines, so every code agrees bit-for-bit.
    */
  private def quantizeInt8(s: SparkSession, d: String): DataFrame = {
    val dims = 64
    val e = Tables.spread(Tables.embeddings(s, d))
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
    val stats = e.select(posexplode(col("v")).as(Seq("j", "x")))
      .groupBy("j").agg(min("x").as("mn"), max("x").as("mx"))
      .orderBy("j").collect()
    if (stats.isEmpty) return e.sparkSession.emptyDataFrame
      .select(lit(0L).as("vec_id"), lit(0).as("dim"), lit(0L).as("q"))
      .limit(0)
    require(stats.length == dims, s"expected $dims dims, got ${stats.length}")
    val mn = typedlit(stats.map(_.getDouble(1)).toSeq)
    val mx = typedlit(stats.map(_.getDouble(2)).toSeq)
    val qarr = transform(col("v"), (x, i) => {
      val lo = element_at(mn, i + 1)
      val hi = element_at(mx, i + 1)
      when(hi === lo, lit(0L)).otherwise(
        least(lit(255L), floor((x - lo) * lit(255.0) / (hi - lo))))
    })
    e.select(col("vec_id"), posexplode(qarr).as(Seq("dim", "q")))
      .orderBy("vec_id", "dim")
  }

  /** ANN-fidelity AUDIT (same role [[Agreement.gateAgreement]] plays for
    * quality gates): per query id, the size of the brute-force top-10,
    * the LSH tier's top-10, and their overlap — recall made an
    * oracle-checkable RESULT rather than only a spec assertion. This is
    * only possible because the LSH tier is deterministic end to end:
    * the hyperplanes are literal constants ([[planeComponent]] — pure
    * integer mixing), so the oracle SQL regenerates the identical
    * planes as array literals and replays signature → bucket join →
    * cosine re-rank in DuckDB. Both engines sum dot products
    * left-to-right in double precision, so the sign bits (and hence
    * buckets) agree bit-for-bit.
    */
  def annRecall(s: SparkSession, d: String): DataFrame = {
    val bf = exactAndLsh("s_ann_bruteforce")(s, d).select("qid", "nid")
    val ann = exactAndLsh("s_ann_lsh")(s, d).select("qid", "nid")
    val nBf = bf.groupBy("qid").agg(count(lit(1)).as("n_bf"))
    val nAnn = ann.groupBy("qid").agg(count(lit(1)).as("n_ann"))
    val nCommon = bf.join(ann, Seq("qid", "nid"))
      .groupBy("qid").agg(count(lit(1)).as("n_common"))
    // brute force always ranks every query id: left joins from it
    nBf.join(nAnn, Seq("qid"), "left")
      .join(nCommon, Seq("qid"), "left")
      .select(col("qid"), col("n_bf"),
        coalesce(col("n_ann"), lit(0L)).as("n_ann"),
        coalesce(col("n_common"), lit(0L)).as("n_common"))
      .orderBy("qid")
  }

  /** The hyperplane family as SQL double-array literals
    * (Double.toString round-trips exactly; DuckDB parses
    * shortest-round-trip decimals back to the same IEEE double).
    */
  private[pipeline] def planeSqlLit(t: Int, b: Int, dims: Int): String =
    (0 until dims).map(i => planeComponent(t, b, i).toString)
      .mkString("[", ", ", "]")

  /** Shared DuckDB CTE block of the s_ann_lsh pipeline — signatures →
    * bucket join → exact cosine re-rank, emitting `e(vec_id, v)` and
    * `lshrk(qid, nid, rk)`. ONE definition behind both the s_ann_lsh
    * oracle and [[annRecallOracle]] so the audit can never disagree
    * with the tier it measures. The width/table count is [[lshPlan]]
    * evaluated at the oracle contract's corpus size — Verify runs at
    * sf0.01 and the suite at sf0.001, both 500 embeddings — so the
    * static SQL and the adaptive engine plan stay the same (4 bits, 8
    * tables, 0 probes) by construction; a CASE/error() regime guard in
    * the cand CTE (r14 ADVICE) turns any out-of-regime corpus into an
    * explicit failure instead of a baffling hash mismatch.
    */
  private def annLshCtes: String = {
    val (bits, tables) = lshPlan(500, AnnCos, AnnRecall)
    val dims = 64
    val sigSelects = (0 until tables).map { t =>
      val bitTerms = (0 until bits).map { b =>
        s"${1 << b}*(CASE WHEN list_dot_product(v, " +
          s"${planeSqlLit(t, b, dims)}) > 0 THEN 1 ELSE 0 END)"
      }.mkString(" + ")
      s"  SELECT vec_id, $t AS t, $bitTerms AS sig FROM e"
    }.mkString("\n  UNION ALL\n")
    s"""e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |sigs AS (
       |$sigSelects),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid
       |  FROM sigs q JOIN sigs c
       |    ON q.t = c.t AND q.sig = c.sig AND c.vec_id <> q.vec_id
       |  WHERE q.vec_id < 5
       |    AND CASE WHEN (SELECT count(*) FROM embeddings) <= 2048
       |      THEN TRUE ELSE error('lshPlan regime mismatch: static ' ||
       |      'oracle SQL assumes n <= 2048 (4-bit, probe-0 plan); ' ||
       |      'regenerate for this corpus') END),
       |lshrk AS (
       |  SELECT cand.qid, cand.nid, row_number() OVER (
       |      PARTITION BY cand.qid
       |      ORDER BY list_cosine_similarity(eq.v, ec.v) DESC, cand.nid
       |    ) AS rk
       |  FROM cand
       |  JOIN e eq ON eq.vec_id = cand.qid
       |  JOIN e ec ON ec.vec_id = cand.nid)""".stripMargin
  }

  /** DuckDB twin of the full s_ann_lsh tier (graduated from rows-only
    * in round 14: the hyperplanes were always deterministic plan
    * literals — a_ann_recall's oracle has replayed them green since
    * round 5 — so the tier itself carries the same (qid, nid, rank)
    * contract as the IVF/PQ siblings).
    */
  private def annLshOracle: String =
    s"""WITH $annLshCtes
       |SELECT qid, nid, CAST(rk AS INTEGER) AS rank
       |FROM lshrk WHERE rk <= 10
       |ORDER BY qid, rank""".stripMargin

  /** DuckDB twin of [[annRecall]] — the shared [[annLshCtes]] block
    * plus the brute-force leg and the overlap counts.
    */
  private def annRecallOracle: String = {
    s"""WITH $annLshCtes,
       |lsh AS (
       |  SELECT qid, nid FROM lshrk WHERE rk <= 10),
       |bf AS (
       |  SELECT qid, nid FROM (
       |    SELECT a.vec_id AS qid, b.vec_id AS nid, row_number() OVER (
       |        PARTITION BY a.vec_id
       |        ORDER BY list_cosine_similarity(a.embedding, b.embedding)
       |          DESC, b.vec_id) AS rk
       |    FROM embeddings a, embeddings b
       |    WHERE a.vec_id < 5 AND b.vec_id <> a.vec_id)
       |  WHERE rk <= 10)
       |SELECT bfc.qid, bfc.n_bf,
       |  coalesce(annc.n_ann, 0) AS n_ann,
       |  coalesce(cc.n_common, 0) AS n_common
       |FROM (SELECT qid, count(*) AS n_bf FROM bf GROUP BY qid) bfc
       |LEFT JOIN (SELECT qid, count(*) AS n_ann FROM lsh
       |           GROUP BY qid) annc USING (qid)
       |LEFT JOIN (SELECT bf.qid, count(*) AS n_common
       |           FROM bf JOIN lsh USING (qid, nid)
       |           GROUP BY bf.qid) cc USING (qid)
       |ORDER BY qid""".stripMargin
  }

  /** Margin-based pair mining (Artetxe & Schwenk, ACL 2019 — the
    * LASER/CCMatrix bitext-mining criterion, reused here for any
    * cross-slice alignment: parallel sentences, near-duplicate modality
    * pairs, query-document alignment). Raw cosine over-selects "hub"
    * vectors that are close to EVERYTHING; the margin score divides each
    * pair's cosine by the mean cosine of both endpoints' k-nearest
    * neighborhoods, so a pair only ranks high if the two are close to
    * each other AND NOT that close to everything else:
    *
    *   margin(x,y) = cos(x,y) / ((avgNNₖ(x,B) + avgNNₖ(y,A)) / 2)
    *
    * Sides here: even-label vectors (A, anchors — a deterministic
    * 20-vector batch like s_ann_bruteforce's query set) vs odd-label
    * vectors (B, the mined side). The backward penalty avgNNₖ(y,·) runs
    * against the anchor BATCH — exactly how mining at scale batches
    * (penalties against the in-flight batch, corpus side through the ANN
    * tier instead of this exact scan; the composition is the s_ann_* job).
    *
    * Determinism discipline: one pair-scan SHAPE feeds both penalty
    * directions and the final ranking (recomputed per consumer — the
    * frame is |B|·|anchors| dot products, bounded by the batch; a
    * long-lived mining session persists it explicitly, but a registered
    * query must not leak cache entries across bench reruns); the k-NN
    * means are EXPLICIT left-to-right
    * 4-term additions over rank-indexed values, not an unordered SUM, so
    * both engines fold identical doubles in identical order; output is
    * ranks (the bruteforce contract: float ulps cannot reorder non-tied
    * margins). Penalties and ranking use the bounded-heap TopKPerKey —
    * nothing sorts the pair frame.
    */
  def marginMining(emb: DataFrame, k: Int = 4): DataFrame = {
    val e = Tables.spread(emb)
      .select(col("vec_id"), col("label"),
        VectorOps.normalized(VectorOps.asDouble(col("embedding"))).as("v"))
    val a = e.filter(pmod(col("label"), lit(2)) === 0 && col("vec_id") < 40)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val b = e.filter(pmod(col("label"), lit(2)) === 1)
      .select(col("vec_id").as("nid"), col("v").as("bv"))
    val pairs = b.join(broadcast(a), col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        VectorOps.dot(col("qv"), col("bv")).as("c"))
    def knnMean(keyCol: String, otherCol: String): DataFrame = {
      val top = graft.plans.TopKPerKey.topKPerKey(pairs,
        Seq(keyCol), Seq(("c", true), (otherCol, false)), k)
        .withColumn("rk", row_number().over(Window.partitionBy(col(keyCol))
          .orderBy(col("c").desc, col(otherCol))))
      val terms = (1 to k).map(i => max(when(col("rk") === i, col("c"))))
      top.groupBy(keyCol)
        .agg(terms.reduceLeft(_ + _).as("pen_sum")) // explicit fold order
        .select(col(keyCol), (col("pen_sum") / k).as(s"pen_$keyCol"))
    }
    val qpen = knnMean("qid", "nid")
    val npen = knnMean("nid", "qid")
    val margins = pairs
      .join(broadcast(qpen), "qid").join(npen, "nid")
      .select(col("qid"), col("nid"),
        (col("c") / ((col("pen_qid") + col("pen_nid")) / 2)).as("m"))
    graft.plans.TopKPerKey.topKPerKey(margins,
      Seq("qid"), Seq(("m", true), ("nid", false)), 3)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("m").desc, col("nid"))))
      .select(col("qid"), col("nid"), col("rank"))
      .orderBy("qid", "rank")
  }

  /** Chunk→document mean pooling — the aggregation step of every
    * long-document embedding pipeline (a doc longer than the encoder's
    * window embeds as chunks — p_chunk_docs' output shape — and serves
    * as ONE vector: the mean of its chunk embeddings). Groups here are
    * the fixture convention `vec_id DIV 5` (five consecutive chunk
    * vectors per document), chunk order `vec_id % 5`.
    *
    * Float-determinism discipline: the per-dim sum is an EXPLICIT
    * chunk-indexed left fold — ((((c₀+c₁)+c₂)+c₃)+c₄, absent chunks
    * exactly 0.0) — never an unordered SUM, so both engines add
    * identical doubles in identical order and the raw pooled doubles
    * hash-match bit-for-bit (the unrolled-kmeans contract, no rounding
    * grid needed). One (group, dim)-keyed shuffle; output is group×dims
    * rows, 5× smaller than its input — the plan a 100 TB chunk corpus
    * wants (pool BEFORE the ANN index, not after).
    */
  private def embedPool(s: SparkSession, d: String): DataFrame = {
    val e = Tables.spread(Tables.embeddings(s, d))
      .select(expr("vec_id DIV 5").as("group_id"),
        pmod(col("vec_id"), lit(5)).cast("int").as("chunk"),
        VectorOps.asDouble(col("embedding")).as("v"))
    val x = e.select(col("group_id"), col("chunk"),
      posexplode(col("v")).as(Seq("dim", "x")))
    val terms = (0 until 5).map(i =>
      coalesce(max(when(col("chunk") === i, col("x"))), lit(0.0)))
    x.groupBy("group_id", "dim")
      .agg(terms.reduceLeft(_ + _).as("sum5"),
        count(lit(1)).as("n_chunks"))
      .select(col("group_id"), col("dim"),
        (col("sum5") / col("n_chunks").cast("double")).as("pooled"),
        col("n_chunks"))
      .orderBy("group_id", "dim")
  }

  lazy val queries: Map[String, Q] = exactAndLsh ++ Map(
    "s_embed_pool" -> { (s, d) => embedPool(s, d) },
    "s_margin_mining" -> { (s, d) => marginMining(Tables.embeddings(s, d)) },
    "a_ann_recall" -> { (s, d) => annRecall(s, d) },
    "s_ann_pq" -> { (s, d) => pqQuery(s, d) },
    "s_ann_ivfpq" -> { (s, d) => ivfpqQuery(s, d) },
    "s_quantize_int8" -> { (s, d) => quantizeInt8(s, d) },
    // IVF-style ANN: 16 deterministic centroids (a corpus sample), each
    // vector assigned to its nearest cell; queries probe their top-10
    // cells and re-rank exactly within candidates. Corpus cost at scale:
    // one assignment scan + equi-join on cell id — no all-pairs product.
    // Every step is deterministic pure arithmetic, so unlike LSH/PQ this
    // tier carries a FULL output oracle (see `oracles`): DuckDB replays
    // centroid sampling → cell assignment → probe → re-rank and must
    // reproduce the (qid, nid, rank) rows bit-for-bit.
    "s_ann_ivf" -> { (s, d) =>
      val e = Tables.spread(Tables.embeddings(s, d))
        .select(col("vec_id"),
          VectorOps.normalized(VectorOps.asDouble(col("embedding"))).as("v"))
      // deterministic "training" with NO driver-side count scan: the 16
      // corpus vectors with the smallest mixHash(vec_id) are the
      // centroids — a TakeOrderedAndProject (per-partition heaps, 16 rows
      // to the driver), order-stable across runs/retries/partitionings,
      // and (unlike xxhash64) plain int64 arithmetic the oracle engine
      // recomputes exactly. Collected to plan LITERALS (the same move as
      // s_kmeans/PQ): assignment becomes a per-row argmax expression, so
      // the corpus is never cross-joined against the centroid table nor
      // shuffled through a per-vector window — at scale that join+window
      // form moves n·k rows; this form moves zero.
      val centRows = e
        .select(col("vec_id"), col("v"),
          TrainingSet.mixHash(col("vec_id")).as("h"))
        .orderBy(col("h"), col("vec_id")).limit(16)
        .select("v").collect().map(_.getSeq[Double](0).toSeq).toSeq
      val k = centRows.length
      if (k == 0) {
        e.sparkSession.emptyDataFrame
          .select(lit(0L).as("qid"), lit(0L).as("nid"), lit(0).as("rank"))
          .limit(0)
      } else {
        val cbLit = typedlit(centRows)
        // dots[c] = dot(v, centroid_c); cell = first index attaining the
        // max (array_position compares the max against its own element —
        // the same double, so exact equality is safe; first-match ties
        // to the smaller cid, identical to the oracle's `dot DESC, cid`)
        val dots = transform(sequence(lit(0), lit(k - 1)), c =>
          VectorOps.dot(col("v"), element_at(cbLit, c + 1)))
        val assigned = e.withColumn("dots", dots)
          .select(col("vec_id"), col("v"),
            (array_position(col("dots"), array_max(col("dots"))) - 1)
              .cast("int").as("cell"))
        // probe top-10 cells per query. nprobe is THE recall/cost dial:
        // this fixture's embeddings are near-uniform noise (top cosine
        // ≈ 0.51), so recall ≈ fraction of cells probed; clustered real
        // corpora get the same recall from far fewer probes. 10/16 keeps
        // the recall spec honest instead of relying on a lucky draw.
        // The cell ranking is an array_sort over k structs — per-row,
        // no window, no shuffle; (-dot, cid) ascending ≡ dot desc, cid.
        val probeCells = slice(array_sort(
          transform(sequence(lit(0), lit(k - 1)), c =>
            struct((-element_at(col("dots"), c + 1)).as("nd"),
              c.as("cid")))), 1, math.min(10, k))
        val probes = e.filter(col("vec_id") < 5)
          .withColumn("dots", dots)
          .select(col("vec_id").as("qid"), col("v").as("qv"),
            explode(transform(probeCells, x => x.getField("cid")))
              .as("cell"))
        // assignment is unique per vector, so (qid, nid) cannot repeat —
        // no dedup needed between the cell join and the bounded heap
        assigned.join(broadcast(probes), Seq("cell"))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("nid"),
            VectorOps.dot(col("qv"), col("v")).as("c"))
          .transform(topK(_, 10))
      }
    })

  /** DuckDB twin of the complete IVF pipeline. Reproducibility rests on
    * three facts: the centroid sample is ranked by pure int64 arithmetic
    * (mixHash), normalization and dot products are left-to-right double
    * sums in both engines, and every tie in the argmax/rank steps breaks
    * on an integer id.
    */
  private def annIvfOracle: String =
    """WITH e AS (
      |  SELECT vec_id,
      |    list_transform(embedding::DOUBLE[], x -> x /
      |      sqrt(list_dot_product(embedding::DOUBLE[],
      |                            embedding::DOUBLE[]))) AS v
      |  FROM embeddings),
      |cents AS (
      |  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cid, v
      |  FROM (SELECT vec_id, v,
      |          ((vec_id * 2654435761) % 4294967296) AS h FROM e)
      |  ORDER BY h, vec_id LIMIT 16),
      |assigned AS (
      |  SELECT vec_id, v, cid AS cell FROM (
      |    SELECT e.vec_id, e.v, c.cid, row_number() OVER (
      |        PARTITION BY e.vec_id
      |        ORDER BY list_dot_product(e.v, c.v) DESC, c.cid) AS rn
      |    FROM e CROSS JOIN cents c)
      |  WHERE rn = 1),
      |probes AS (
      |  SELECT qid, cell FROM (
      |    SELECT q.vec_id AS qid, c.cid AS cell, row_number() OVER (
      |        PARTITION BY q.vec_id
      |        ORDER BY list_dot_product(q.v, c.v) DESC, c.cid) AS rn
      |    FROM e q CROSS JOIN cents c WHERE q.vec_id < 5)
      |  WHERE rn <= 10)
      |SELECT qid, nid, rank FROM (
      |  SELECT p.qid, a.vec_id AS nid, row_number() OVER (
      |      PARTITION BY p.qid
      |      ORDER BY list_dot_product(eq.v, a.v) DESC, a.vec_id) AS rank
      |  FROM probes p
      |  JOIN assigned a ON a.cell = p.cell AND a.vec_id <> p.qid
      |  JOIN e eq ON eq.vec_id = p.qid)
      |WHERE rank <= 10 ORDER BY qid, rank""".stripMargin

  /** DuckDB twin of the complete IVF-PQ pipeline. Adds to the IVF
    * oracle's determinism facts: subspace slices/dots are the same
    * left-to-right folds (list_slice + list_dot_product), the PQ argmin
    * ties break on integer cid exactly like `array_position`-of-min,
    * and the 8-term ADC sum is an EXPLICIT addition chain — the same
    * association order as the engine's left fold.
    */
  /** DuckDB twin of the standalone PQ tier — the ivfpq oracle minus
    * the IVF probe step (graduated round 9 on the equivalences that
    * oracle already proved green: `aggregate`-fold subspace dots ≡
    * `list_dot_product`, first-min `array_position` encoding ≡
    * `row_number ORDER BY dist, cid`, the explicit 8-term ADC chain,
    * and unrounded-dot re-rank with nid ties): every corpus vector is
    * ADC-scored against each query's table, top-100 shortlists by
    * (adc DESC, nid), exact re-rank keeps rank ≤ 10.
    */
  private def annPqOracle: String = {
    val m = 8; val sub = 8
    val adcChain = (1 to m).map(j =>
      s"qtab[$j][codes[$j] + 1]").mkString(" + ")
    s"""WITH e AS (
       |  SELECT vec_id,
       |    list_transform(embedding::DOUBLE[], x -> x /
       |      sqrt(list_dot_product(embedding::DOUBLE[],
       |                            embedding::DOUBLE[]))) AS v
       |  FROM embeddings),
       |cents AS (
       |  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cid, v
       |  FROM (SELECT vec_id, v,
       |          ((vec_id * 2654435761) % 4294967296) AS h FROM e)
       |  ORDER BY h, vec_id LIMIT 16),
       |pj AS (
       |  SELECT vec_id, j, cid,
       |    list_dot_product(cb, cb) - 2 * list_dot_product(sv, cb) AS dist
       |  FROM (
       |    SELECT e.vec_id, r.j, c.cid,
       |      list_slice(e.v, r.j * $sub + 1, r.j * $sub + $sub) AS sv,
       |      list_slice(c.v, r.j * $sub + 1, r.j * $sub + $sub) AS cb
       |    FROM e CROSS JOIN range($m) r(j) CROSS JOIN cents c)),
       |codes AS (
       |  SELECT vec_id, list(code ORDER BY j) AS codes FROM (
       |    SELECT vec_id, j, cid AS code, row_number() OVER (
       |        PARTITION BY vec_id, j ORDER BY dist, cid) AS rn
       |    FROM pj) WHERE rn = 1 GROUP BY vec_id),
       |qt AS (
       |  SELECT qid, list(tab ORDER BY j) AS qtab FROM (
       |    SELECT qid, j, list(dot ORDER BY cid) AS tab FROM (
       |      SELECT q.vec_id AS qid, r.j, c.cid,
       |        list_dot_product(
       |          list_slice(q.v, r.j * $sub + 1, r.j * $sub + $sub),
       |          list_slice(c.v, r.j * $sub + 1, r.j * $sub + $sub)) AS dot
       |      FROM e q CROSS JOIN range($m) r(j) CROSS JOIN cents c
       |      WHERE q.vec_id < 5)
       |    GROUP BY qid, j)
       |  GROUP BY qid),
       |adc AS (
       |  SELECT qt.qid, a.vec_id AS nid, $adcChain AS adc
       |  FROM qt
       |  CROSS JOIN codes a
       |  WHERE a.vec_id <> qt.qid),
       |short AS (
       |  SELECT qid, nid FROM (
       |    SELECT qid, nid, row_number() OVER (
       |        PARTITION BY qid ORDER BY adc DESC, nid) AS rn
       |    FROM adc) WHERE rn <= 100)
       |SELECT qid, nid, rank FROM (
       |  SELECT s.qid, s.nid, row_number() OVER (
       |      PARTITION BY s.qid
       |      ORDER BY list_dot_product(eq.v, en.v) DESC, s.nid) AS rank
       |  FROM short s
       |  JOIN e eq ON eq.vec_id = s.qid
       |  JOIN e en ON en.vec_id = s.nid)
       |WHERE rank <= 10 ORDER BY qid, rank""".stripMargin
  }

  private def annIvfPqOracle: String = {
    val m = 8; val sub = 8
    val adcChain = (1 to m).map(j =>
      s"qtab[$j][codes[$j] + 1]").mkString(" + ")
    s"""WITH e AS (
       |  SELECT vec_id,
       |    list_transform(embedding::DOUBLE[], x -> x /
       |      sqrt(list_dot_product(embedding::DOUBLE[],
       |                            embedding::DOUBLE[]))) AS v
       |  FROM embeddings),
       |cents AS (
       |  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cid, v
       |  FROM (SELECT vec_id, v,
       |          ((vec_id * 2654435761) % 4294967296) AS h FROM e)
       |  ORDER BY h, vec_id LIMIT 16),
       |assigned AS (
       |  SELECT vec_id, cid AS cell FROM (
       |    SELECT e.vec_id, c.cid, row_number() OVER (
       |        PARTITION BY e.vec_id
       |        ORDER BY list_dot_product(e.v, c.v) DESC, c.cid) AS rn
       |    FROM e CROSS JOIN cents c)
       |  WHERE rn = 1),
       |pj AS (
       |  SELECT vec_id, j, cid,
       |    list_dot_product(cb, cb) - 2 * list_dot_product(sv, cb) AS dist
       |  FROM (
       |    SELECT e.vec_id, r.j, c.cid,
       |      list_slice(e.v, r.j * $sub + 1, r.j * $sub + $sub) AS sv,
       |      list_slice(c.v, r.j * $sub + 1, r.j * $sub + $sub) AS cb
       |    FROM e CROSS JOIN range($m) r(j) CROSS JOIN cents c)),
       |codes AS (
       |  SELECT vec_id, list(code ORDER BY j) AS codes FROM (
       |    SELECT vec_id, j, cid AS code, row_number() OVER (
       |        PARTITION BY vec_id, j ORDER BY dist, cid) AS rn
       |    FROM pj) WHERE rn = 1 GROUP BY vec_id),
       |probes AS (
       |  SELECT qid, cell FROM (
       |    SELECT q.vec_id AS qid, c.cid AS cell, row_number() OVER (
       |        PARTITION BY q.vec_id
       |        ORDER BY list_dot_product(q.v, c.v) DESC, c.cid) AS rn
       |    FROM e q CROSS JOIN cents c WHERE q.vec_id < 5)
       |  WHERE rn <= 10),
       |qt AS (
       |  SELECT qid, list(tab ORDER BY j) AS qtab FROM (
       |    SELECT qid, j, list(dot ORDER BY cid) AS tab FROM (
       |      SELECT q.vec_id AS qid, r.j, c.cid,
       |        list_dot_product(
       |          list_slice(q.v, r.j * $sub + 1, r.j * $sub + $sub),
       |          list_slice(c.v, r.j * $sub + 1, r.j * $sub + $sub)) AS dot
       |      FROM e q CROSS JOIN range($m) r(j) CROSS JOIN cents c
       |      WHERE q.vec_id < 5)
       |    GROUP BY qid, j)
       |  GROUP BY qid),
       |adc AS (
       |  SELECT p.qid, a.vec_id AS nid, $adcChain AS adc
       |  FROM probes p
       |  JOIN assigned a ON a.cell = p.cell AND a.vec_id <> p.qid
       |  JOIN codes USING (vec_id)
       |  JOIN qt ON qt.qid = p.qid),
       |short AS (
       |  SELECT qid, nid FROM (
       |    SELECT qid, nid, row_number() OVER (
       |        PARTITION BY qid ORDER BY adc DESC, nid) AS rn
       |    FROM adc) WHERE rn <= 60)
       |SELECT qid, nid, rank FROM (
       |  SELECT s.qid, s.nid, row_number() OVER (
       |      PARTITION BY s.qid
       |      ORDER BY list_dot_product(eq.v, en.v) DESC, s.nid) AS rank
       |  FROM short s
       |  JOIN e eq ON eq.vec_id = s.qid
       |  JOIN e en ON en.vec_id = s.nid)
       |WHERE rank <= 10 ORDER BY qid, rank""".stripMargin
  }

  lazy val oracles: Map[String, String] = Map(
    "a_ann_recall" -> annRecallOracle,
    "s_ann_lsh" -> annLshOracle,
    "s_ann_ivf" -> annIvfOracle,
    "s_ann_pq" -> annPqOracle,
    "s_ann_ivfpq" -> annIvfPqOracle,
    "s_quantize_int8" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |x AS (
        |  SELECT vec_id, CAST(j AS INT) AS j, v[j + 1] AS x
        |  FROM e, unnest(range(64)) u(j)),
        |st AS (SELECT j, min(x) AS mn, max(x) AS mx FROM x GROUP BY j)
        |SELECT vec_id, x.j AS dim,
        |  CASE WHEN mx = mn THEN 0
        |       ELSE least(255, CAST(floor((x - mn) * 255.0 / (mx - mn))
        |         AS BIGINT)) END AS q
        |FROM x JOIN st USING (j)
        |ORDER BY vec_id, dim""".stripMargin,
    // same explicit chunk-indexed fold and division — the raw doubles
    // are bit-identical, so the hash compare needs no rounding grid
    "s_embed_pool" ->
      """WITH e AS (
        |  SELECT vec_id // 5 AS group_id, CAST(vec_id % 5 AS INT) AS chunk,
        |         embedding::DOUBLE[] AS v
        |  FROM embeddings),
        |x AS (
        |  SELECT group_id, chunk, CAST(j AS INT) AS dim, v[j + 1] AS x
        |  FROM e, unnest(range(64)) u(j)),
        |g AS (
        |  SELECT group_id, dim,
        |    ((((coalesce(max(CASE WHEN chunk = 0 THEN x END), 0.0)
        |      + coalesce(max(CASE WHEN chunk = 1 THEN x END), 0.0))
        |      + coalesce(max(CASE WHEN chunk = 2 THEN x END), 0.0))
        |      + coalesce(max(CASE WHEN chunk = 3 THEN x END), 0.0))
        |      + coalesce(max(CASE WHEN chunk = 4 THEN x END), 0.0)) AS sum5,
        |    CAST(count(*) AS BIGINT) AS n_chunks
        |  FROM x GROUP BY 1, 2)
        |SELECT group_id, dim, sum5 / CAST(n_chunks AS DOUBLE) AS pooled,
        |  n_chunks
        |FROM g ORDER BY group_id, dim""".stripMargin,
    // the margin arithmetic replayed end-to-end: same sides, same k-NN
    // rank windows, same EXPLICIT ((c1+c2)+c3)+c4 fold, same ratio —
    // ranks compare exactly (the bruteforce float contract)
    "s_margin_mining" ->
      """WITH a AS (
        |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
        |  WHERE label % 2 = 0 AND vec_id < 40),
        |b AS (
        |  SELECT vec_id AS nid, embedding AS bv FROM embeddings
        |  WHERE label % 2 = 1),
        |pairs AS (
        |  SELECT qid, nid, list_cosine_similarity(qv, bv) AS c
        |  FROM a, b WHERE nid <> qid),
        |fr AS (
        |  SELECT qid, nid, c, row_number() OVER (
        |    PARTITION BY qid ORDER BY c DESC, nid) AS rk FROM pairs),
        |qpen AS (
        |  SELECT qid,
        |    (((max(CASE WHEN rk = 1 THEN c END)
        |      + max(CASE WHEN rk = 2 THEN c END))
        |      + max(CASE WHEN rk = 3 THEN c END))
        |      + max(CASE WHEN rk = 4 THEN c END)) / 4 AS qp
        |  FROM fr WHERE rk <= 4 GROUP BY qid),
        |br AS (
        |  SELECT qid, nid, c, row_number() OVER (
        |    PARTITION BY nid ORDER BY c DESC, qid) AS rk FROM pairs),
        |npen AS (
        |  SELECT nid,
        |    (((max(CASE WHEN rk = 1 THEN c END)
        |      + max(CASE WHEN rk = 2 THEN c END))
        |      + max(CASE WHEN rk = 3 THEN c END))
        |      + max(CASE WHEN rk = 4 THEN c END)) / 4 AS np
        |  FROM br WHERE rk <= 4 GROUP BY nid),
        |m AS (
        |  SELECT p.qid, p.nid, p.c / ((q.qp + n.np) / 2) AS m
        |  FROM pairs p JOIN qpen q USING (qid) JOIN npen n USING (nid)),
        |r AS (
        |  SELECT qid, nid, row_number() OVER (
        |    PARTITION BY qid ORDER BY m DESC, nid) AS rank FROM m)
        |SELECT qid, nid, rank FROM r WHERE rank <= 3
        |ORDER BY qid, rank""".stripMargin,
    "s_ann_bruteforce" ->
      """SELECT qid, nid, rank FROM (
        |  SELECT a.vec_id AS qid, b.vec_id AS nid,
        |         row_number() OVER (
        |           PARTITION BY a.vec_id
        |           ORDER BY list_cosine_similarity(a.embedding, b.embedding)
        |             DESC, b.vec_id) AS rank
        |  FROM embeddings a, embeddings b
        |  WHERE a.vec_id < 5 AND b.vec_id <> a.vec_id)
        |WHERE rank <= 10
        |ORDER BY qid, rank""".stripMargin)
}
