package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Sketch aggregations as native `TypedImperativeAggregate`s — the
  * Catalyst mechanism built for exactly this shape (HyperLogLog++ and
  * percentile_approx use it): a mutable object buffer inside
  * ObjectHashAggregate with map-side partial aggregation, serialized once
  * per partition boundary instead of per row. Replaces the
  * `groupByKey + Aggregator` formulation, whose Dataset encoder boundary
  * deserialized every input row into JVM tuples (measured ~2× slower at
  * sf0.1) and whose typed path planned no partial aggregation.
  *
  * Both sketches consume 64-bit shingle hashes (`Dedup.shingleHashes`).
  * Deterministic: literal seed constants, no RNG — identical results
  * across retries and AQE re-execution.
  */

/** MinHash signature: per hash function j of k, min over inputs of the
  * Carter–Wegman affine map `(a_j·h + b_j) mod (2^61 − 1)` over the
  * (floor-modded) input hash. Buffer = Array[Long](k).
  *
  * The affine-mod-Mersenne family replaced the earlier avalanche mixer
  * in round 16 for ENGINE PORTABILITY (graduating d_minhash_lsh to a
  * full oracle): the map is plain modular integer arithmetic any SQL
  * engine replays exactly (DuckDB: `(h::HUGEINT * a + b) %
  * 2305843009213693951`), and it is the textbook universal hash family
  * minwise theory is actually stated for — strictly better-grounded
  * independence than an ad-hoc bit mixer. The JVM side reduces the
  * 122-bit product with `Math.multiplyHigh` and the Mersenne fold
  * (2^61 ≡ 1), so the hot loop stays multiply-add with no BigInteger.
  * Coefficients are deterministic literals ([[MinHashSketch.coeffA]]/
  * [[MinHashSketch.coeffB]]) interpolated into the oracle SQL.
  */
case class MinHashSketch(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  import MinHashSketch.{P61, mulMod61, A, B}

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sketch expects bigint, got ${t.sql}")
  }

  @inline private def mix(h0: Long, j: Int): Long = {
    // floorMod admits ANY long input (other callers feed raw xxhash64,
    // which can be negative); the portable md5-60-bit base is already
    // in [0, p), where floorMod is the identity — the oracle replays
    // that case with plain `%`
    val h = java.lang.Math.floorMod(h0, P61)
    val a = if (j < A.length) A(j) else MinHashSketch.coeffA(j)
    val bc = if (j < B.length) B(j) else MinHashSketch.coeffB(j)
    val t = mulMod61(h, a) + bc
    if (t >= P61) t - P61 else t
  }

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(b: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val m = mix(h, i)
        if (m < b(i)) b(i) = m
        i += 1
      }
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(b: Array[Long]): Any = new GenericArrayData(b.clone())

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(k * 8)
    var i = 0
    while (i < k) { bb.putLong(b(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](k)
    var i = 0
    while (i < k) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MinHashSketch = copy(child = c.head)
}

/** SimHash: per bit position, sum of ±1 presence votes over input hashes;
  * sign → bit. Buffer = Array[Long](64) vote counters (long: no overflow
  * at any corpus size).
  */
case class SimHashSketch(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_sketch expects bigint, got ${t.sql}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(b: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) b(i) += 1 else b(i) -= 1
        i += 1
      }
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(b: Array[Long]): Any = {
    var out = 0L
    var i = 0
    while (i < 64) { if (b(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 8)
    var i = 0
    while (i < 64) { bb.putLong(b(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](64)
    var i = 0
    while (i < 64) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): SimHashSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): SimHashSketch = copy(child = c.head)
}

/** SpaceSaving heavy-hitters summary (Metwally et al., "Efficient
  * computation of frequent and top-k elements in data streams"): at most
  * `m` (item, count, err) counters; a full summary evicts its minimum
  * counter to admit a new item at count min+1 with err=min. Guarantees
  * per partition stream: reported count ≥ true count ≥ reported − err,
  * and any item with true frequency > n/m is present. Parallel merge
  * (Agarwal et al., "Mergeable summaries"): counter-wise sum over the
  * union, where an item MISSING from one side adds that side's minimum
  * counter (its maximum possible uncounted frequency there) to BOTH
  * count and err — count stays an overestimate of true frequency, so
  * the top-m truncation cannot demote a genuine heavy hitter below
  * locally-overcounted tail items, preserving the n/m error class and
  * the frequency->presence guarantee under distributed merge. Buffer is
  * O(m) regardless of input size: the 100 TB "top domains / top tokens"
  * answer without a full (item, count) shuffle of a trillion-row corpus.
  *
  * Output: array<struct<item,count,err>> sorted count desc (ties: item
  * asc). `t_heavy_hitters` is oracle-hash-gated (the fixture summary
  * never evicts, so counts are exact there); eviction and merge error
  * bounds are spec-checked against exact counts in FreqSketchSpec.
  */
case class FreqSketch(child: Expression, m: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.LongMap[(Long, Long)]] {
  type Buf = scala.collection.mutable.LongMap[(Long, Long)]

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("item", LongType, false),
      org.apache.spark.sql.types.StructField("count", LongType, false),
      org.apache.spark.sql.types.StructField("err", LongType, false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"freq_sketch expects bigint, got ${t.sql}")
  }

  override def createAggregationBuffer(): Buf =
    scala.collection.mutable.LongMap.empty[(Long, Long)]

  private def minEntry(b: Buf): (Long, (Long, Long)) = {
    var bestK = 0L; var bestC = Long.MaxValue; var bestE = 0L
    b.foreachEntry { (k, v) =>
      if (v._1 < bestC) { bestK = k; bestC = v._1; bestE = v._2 }
    }
    (bestK, (bestC, bestE))
  }

  override def update(b: Buf, row: InternalRow): Buf = {
    val v = child.eval(row)
    if (v != null) {
      val item = v.asInstanceOf[Long]
      b.get(item) match {
        case Some((c, e)) => b(item) = (c + 1, e)
        case None if b.size < m => b(item) = (1L, 0L)
        case None =>
          val (mk, (mc, _)) = minEntry(b)
          b.remove(mk)
          b(item) = (mc + 1, mc)
      }
    }
    b
  }

  override def merge(a: Buf, b: Buf): Buf = {
    if (b.isEmpty) return a
    // admission bound for items one side never saw: that side's minimum
    // counter if it ever evicted (full), else 0
    def floorOf(s: Buf): Long =
      if (s.size < m) 0L else minEntry(s)._2._1
    val fa = floorOf(a)
    val fb = floorOf(b)
    val out = scala.collection.mutable.LongMap.empty[(Long, Long)]
    // Standard mergeable-summaries rule: an item absent from one side may
    // have occurred up to that side's floor times there, so add the floor
    // to BOTH count and err. Adding it to err alone would leave count an
    // UNDERestimate, and the top-m cut below ranks by count — a heavy
    // hitter spread across partitions could then lose its slot to a
    // locally-overcounted tail item, voiding the containment guarantee.
    a.foreachEntry { (k, va) =>
      out(k) = b.get(k) match {
        case Some(vb) => (va._1 + vb._1, va._2 + vb._2)
        case None => (va._1 + fb, va._2 + fb)
      }
    }
    b.foreachEntry { (k, vb) =>
      if (!a.contains(k)) out(k) = (vb._1 + fa, vb._2 + fa)
    }
    if (out.size <= m) out
    else {
      val kept = out.toSeq.sortBy { case (k, (c, _)) => (-c, k) }.take(m)
      scala.collection.mutable.LongMap.from(kept)
    }
  }

  override def eval(b: Buf): Any = {
    val sorted = b.toSeq.sortBy { case (k, (c, _)) => (-c, k) }
    new GenericArrayData(sorted.map { case (k, (c, e)) =>
      InternalRow(k, c, e) })
  }

  override def serialize(b: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + b.size * 24)
    bb.putInt(b.size)
    b.foreachEntry { (k, v) =>
      bb.putLong(k); bb.putLong(v._1); bb.putLong(v._2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val out = scala.collection.mutable.LongMap.empty[(Long, Long)]
    var i = 0
    while (i < n) {
      val k = bb.getLong(); val c = bb.getLong(); val e = bb.getLong()
      out(k) = (c, e); i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): FreqSketch = copy(child = c.head)
}

/** The affine family's constants and the Mersenne-61 modular multiply
  * — public so the DuckDB oracle builder interpolates the IDENTICAL
  * coefficient literals ([[graft.pipeline.Fingerprints]]' minhash-LSH
  * twin).
  */
object MinHashSketch {
  /** 2^61 − 1 (Mersenne prime) — the hash field modulus. */
  val P61: Long = (1L << 61) - 1

  /** Deterministic 61-bit generator (splitmix-style avalanche of the
    * seed) — build-time only; the hot loop reads the cached arrays.
    */
  private def gen(seed: Long): Long = {
    var h = seed * 0x9E3779B97F4A7C15L + 0x632BE59BD9B4E019L
    h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL
    h ^= h >>> 33; h *= 0xC4CEB9FE1A85EC53L
    h ^= h >>> 33
    h & P61
  }
  /** Multiplier of hash function j — in [1, p−1]. */
  def coeffA(j: Int): Long = gen(2L * j) % (P61 - 1) + 1
  /** Offset of hash function j — in [0, p−1]. */
  def coeffB(j: Int): Long = gen(2L * j + 1) % P61
  private[graft] val A: Array[Long] = Array.tabulate(64)(coeffA)
  private[graft] val B: Array[Long] = Array.tabulate(64)(coeffB)

  /** (x·y) mod (2^61−1) for x, y ∈ [0, p): `multiplyHigh` splits the
    * 122-bit product into hi·2^64 + lo; with 2^61 ≡ 1 (mod p) that
    * folds to 8·hi + (lo >>> 61) + (lo & p), one more fold, one
    * conditional subtract.
    */
  @inline def mulMod61(x: Long, y: Long): Long = {
    val hi = java.lang.Math.multiplyHigh(x, y)
    val lo = x * y
    var r = (hi << 3) + (lo >>> 61) + (lo & P61)
    r = (r & P61) + (r >>> 61)
    if (r >= P61) r - P61 else r
  }
}

object SketchAggregates {
  import org.apache.spark.sql.graftshim.Bridge

  def minhash_sketch(c: Column, k: Int): Column =
    Bridge.column(MinHashSketch(Bridge.expression(c), k)
      .toAggregateExpression())

  def simhash_sketch(c: Column): Column =
    Bridge.column(SimHashSketch(Bridge.expression(c))
      .toAggregateExpression())

  def freq_sketch(c: Column, m: Int): Column =
    Bridge.column(FreqSketch(Bridge.expression(c), m)
      .toAggregateExpression())
}
