package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ZOrderLayout

/** Z-order layout: curve correctness (against a bit-by-bit reference
  * interleave) and the property the layout exists for — per-file min/max
  * ranges tight enough on BOTH dimensions that stats-based skipping
  * prunes files for a predicate on either column.
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def refInterleave(a: Long, b: Long): Long = {
    var z = 0L
    for (i <- 0 until 31) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zvalue matches a bit-by-bit reference interleave and stays " +
      "non-negative at the 31-bit domain edges") {
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 9L),
      (0x7FFFFFFFL, 0L), (0L, 0x7FFFFFFFL), (0x7FFFFFFFL, 0x7FFFFFFFL),
      (123456789L, 987654321L),
      // wider-than-31-bit inputs must clamp to their low 31 bits —
      // a full 32-bit b would shift into the sign bit (an ANSI
      // overflow error in the generated oracle SQL)
      (0x1234567890L, 0x9876543210L), (0xFFFFFFFFL, 0xFFFFFFFFL))
    val out = samples.toDF("a", "b")
      .select(ZOrderLayout.zvalue(col("a"), col("b"))).collect()
      .map(_.getLong(0))
    val expected = samples.map { case (a, b) =>
      refInterleave(a & 0x7FFFFFFFL, b & 0x7FFFFFFFL) }
    assert(out.toSeq == expected)
    assert(out.forall(_ >= 0L), "z must stay in the positive long range")
  }

  test("zvalue is injective on 32-bit pairs (bijection sample)") {
    val n = 4096
    val df = spark.range(n).select(
      (col("id") % 64).as("a"), expr("id div 64").as("b"))
    val distinct = df.select(ZOrderLayout.zvalue(col("a"), col("b")))
      .distinct().count()
    assert(distinct == n)
  }

  test("z-ordered files have tighter per-file ranges on BOTH dims " +
      "than a single-column sort") {
    // 64×64 grid, shuffled ids — each (a, b) cell once
    val grid = spark.range(4096).select(
      (col("id") % 64).as("a"), expr("id div 64").as("b"))
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val nFiles = 16
    ZOrderLayout.writeZOrdered(grid, "a", "b", s"$dir/z", nFiles)
    // baseline: the same data range-sorted by `a` alone
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
    // sorting by `a` gives perfect a-spans but worst-case b-spans; the
    // z-order layout must be tight on BOTH: each of 16 files tiles a
    // 16×16 quadrant of the 64×64 grid (span 15 ≪ 63)
    val (za, zb) = (avgSpan(s"$dir/z", "a"), avgSpan(s"$dir/z", "b"))
    val byaB = avgSpan(s"$dir/bya", "b")
    assert(za <= 16 && zb <= 16, s"z-order spans a=$za b=$zb")
    assert(byaB >= 60, s"baseline b-span $byaB unexpectedly tight")
  }
}
