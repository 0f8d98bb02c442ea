package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CascadeReportStream

/** The streaming cascade report must match a from-first-principles
  * simulation of its stage rules (arrival-order first-keeps per stage
  * over exact shingle sets — the caps never bind at fixture scale), be
  * split-invariant on a chain-free fixture, attribute every planted
  * duplicate class to its own stage, and replay idempotently.
  */
class CascadeStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private case class D(id: Long, text: String)

  // 10 disjoint-vocabulary base docs (60 tokens → 58 shingles each),
  // then one planted duplicate class per stage:
  //  - exact copies of docs 6..8           → stage-1 drops
  //  - last-2-tokens-edited copies of 0..2 → Jaccard 56/60 ≈ 0.93,
  //    stage-2 drops
  //  - 41-token excerpts of docs 3..5      → Jaccard 39/58 ≈ 0.67
  //    (passes stage 2), containment 100 % → stage-3 drops
  private val base = (0 until 10).map(i =>
    D(i.toLong, (1 to 60).map(j => s"t${i}x$j").mkString(" ")))
  private val exacts = (6 to 8).map(i => D(100L + i, base(i).text))
  private val nears = (0 to 2).map { i =>
    val t = base(i).text.split(" ")
    D(200L + i, (t.dropRight(2) ++ Seq(s"q${i}a", s"q${i}b"))
      .mkString(" "))
  }
  private val excerpts = (3 to 5).map(i =>
    D(300L + i, base(i).text.split(" ").slice(9, 50).mkString(" ")))
  private val all = base ++ exacts ++ nears ++ excerpts

  private def sh(text: String): Set[Seq[String]] =
    text.split(" ").sliding(3).filter(_.length == 3).map(_.toSeq).toSet

  /** Stage-wise sequential reference: per batch, apply the three drop
    * rules against the survivor index + smaller-id batch peers.
    */
  private def simulate(batches: Seq[Seq[D]])
      : (Seq[(Long, Long, Long, Long)], Set[Long]) = {
    var index = Seq.empty[D]
    val rows = batches.map { batch =>
      val nRaw = batch.size.toLong
      val s1 = batch.filter(d => !index.exists(_.text == d.text) &&
        !batch.exists(o => o.id < d.id && o.text == d.text))
      def jac(a: D, b: D): Double = {
        val (x, y) = (sh(a.text), sh(b.text))
        val i = (x & y).size.toDouble
        i / (x.size + y.size - i)
      }
      val s2 = s1.filter(d => !index.exists(jac(d, _) >= 0.8) &&
        !s1.exists(o => o.id < d.id && jac(d, o) >= 0.8))
      def contained(d: D, in: D): Boolean = {
        val (x, y) = (sh(d.text), sh(in.text))
        x.size >= 5 && (x & y).size * 100 >= 90 * x.size
      }
      val s3 = s2.filter(d => !index.exists(contained(d, _)) &&
        !s2.exists(o => o.id != d.id && contained(d, o)))
      index = index ++ s3
      (nRaw, s1.size.toLong, s2.size.toLong, s3.size.toLong)
    }
    (rows, index.map(_.id).toSet)
  }

  private def run(batches: Seq[Seq[D]]): (String, Map[String, Long]) = {
    val root = Files.createTempDirectory("cascade").toString
    batches.zipWithIndex.foreach { case (b, i) =>
      CascadeReportStream.ingestBatch(
        b.map(d => (d.id, d.text)).toDF("doc_id", "text"), i.toLong,
        root, maxDf = 1000000)
    }
    val rep = CascadeReportStream.report(spark, root).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    (root, rep)
  }

  private def indexed(root: String): Set[Long] =
    spark.read.parquet(s"$root/fps").select("doc_id")
      .collect().map(_.getLong(0)).toSet

  test("3-batch stream matches the sequential reference, every planted " +
      "class attributed to its own stage") {
    val batches = Seq(base, exacts ++ nears, excerpts)
    val (simRows, simIndex) = simulate(batches)
    val (root, rep) = run(batches)
    val want = Map(
      "0_raw" -> simRows.map(_._1).sum,
      "1_exact" -> simRows.map(_._2).sum,
      "2_near" -> simRows.map(_._3).sum,
      "3_containment" -> simRows.map(_._4).sum)
    assert(rep == want, s"got $rep")
    assert(indexed(root) == simIndex)
    // the fixture really exercises all three cuts: 19 raw, 3 dropped
    // at each stage, 10 full-cascade survivors
    assert(rep == Map("0_raw" -> 19L, "1_exact" -> 16L,
      "2_near" -> 13L, "3_containment" -> 10L), s"got $rep")
    assert(simIndex == base.map(_.id).toSet)

    // at-least-once replay: re-running batch 1 must change nothing
    CascadeReportStream.ingestBatch(
      (exacts ++ nears).map(d => (d.id, d.text)).toDF("doc_id", "text"),
      1L, root, maxDf = 1000000)
    assert(CascadeReportStream.report(spark, root).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap == want)
    assert(indexed(root) == simIndex)
  }

  test("split invariance: the single-batch run (every drop through the " +
      "intra-batch rules) agrees with the 3-batch funnel and survivors") {
    // the 3-batch expectation is the simulated reference the first test
    // already pinned against the actual 3-batch run
    val (simRows, simIndex) = simulate(
      Seq(base, exacts ++ nears, excerpts))
    val (root, rep) = run(Seq(all))
    assert(rep == Map(
      "0_raw" -> simRows.map(_._1).sum,
      "1_exact" -> simRows.map(_._2).sum,
      "2_near" -> simRows.map(_._3).sum,
      "3_containment" -> simRows.map(_._4).sum),
      s"single-batch funnel diverges: $rep")
    assert(indexed(root) == simIndex)
  }

  test("streaming wiring: the foreachBatch runner produces the same " +
      "funnel as direct ingestBatch calls") {
    val root = Files.createTempDirectory("cascadew").toString
    val src = s"$root/src"
    val docs = all.map(d => (d.id, d.text)).toDF("doc_id", "text")
    docs.write.mode("append").parquet(src)
    val stream = spark.readStream.schema(docs.schema).parquet(src)
    val q = CascadeReportStream.start(stream, s"$root/state",
      s"$root/ckpt", maxDf = 1000000)
    try q.processAllAvailable() finally q.stop()
    val rep = CascadeReportStream.report(spark, s"$root/state").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep == Map("0_raw" -> 19L, "1_exact" -> 16L,
      "2_near" -> 13L, "3_containment" -> 10L), s"got $rep")
  }
}
