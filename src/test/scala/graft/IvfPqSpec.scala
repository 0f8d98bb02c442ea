package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavior of the combined IVF-PQ tier that the oracle hash can't
  * express: recall against the exact tier (the fixture's embeddings are
  * near-uniform noise, so the IVF stage's ceiling is ≈ nprobe/k — a
  * clustered real corpus does better with fewer probes), the ADC
  * shortlist's fidelity to the IVF tier it prunes, and the plan shape
  * (cell equi-join + broadcast query side, never a corpus product).
  */
class IvfPqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  private val sf = "/root/testdata/sf0.001"

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val bf = pairs("s_ann_bruteforce")
  private lazy val ivf = pairs("s_ann_ivf")
  private lazy val ivfpq = pairs("s_ann_ivfpq")

  test("recall vs brute force clears the noise-fixture floor") {
    val recall = (bf & ivfpq).size.toDouble / bf.size
    assert(recall >= 0.55, s"ivfpq recall $recall") // measured 0.64
  }

  test("the ADC stage is faithful to the IVF tier it prunes") {
    // ivfpq sees exactly the IVF tier's candidate cells; its loss vs
    // s_ann_ivf is the PQ shortlist alone — the PQ tier's documented
    // 0.76–0.82 class, not compounded bucket loss
    val vsIvf = (ivf & ivfpq).size.toDouble / ivf.size
    assert(vsIvf >= 0.65, s"ivfpq vs ivf $vsIvf") // measured 0.76
  }

  test("every query returns a full ranked top-10 with distinct ranks") {
    val rows = SparkEntry.queries("s_ann_ivfpq")(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.values.foreach { rs =>
      assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to 10))
    }
  }

  test("plan: cell equi-join with broadcast probes, no corpus product") {
    val plan = SparkEntry.queries("s_ann_ivfpq")(spark, sf)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
