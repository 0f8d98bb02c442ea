package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, Fingerprints}

/** The two size-gate constants are Spark confs with the hard-coded values
  * as defaults: `graft.dedup.driverMaxPairs` (driver union-find vs
  * distributed label propagation in [[Dedup.dupClusters]]) and
  * `graft.lsh.bucketCap` (all-pairs vs star join per LSH bucket in
  * [[Fingerprints.cappedPairs]]). Each test flips the conf and observes
  * the PATH change, not just the same answer.
  */
class GateConfSpec extends AnyFunSuite {
  // Isolated session: `newSession()` shares the SparkContext but has its
  // own SessionState/SQLConf, so the conf flips below cannot leak into
  // suites running concurrently in the same forked JVM (sbt's default
  // Test/parallelExecution) and change THEIR gate paths mid-flight.
  lazy val spark = SparkTestSession.get.newSession()

  private def withConf[A](key: String, value: String)(body: => A): A =
    try { spark.conf.set(key, value); body }
    finally spark.conf.unset(key)

  test("graft.dedup.driverMaxPairs=0 forces the distributed path, " +
      "same clusters") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("ida", "idb")
    val expected = Set((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
    def run() = Dedup.dupClusters(pairs)
    // default gate (1M): 3 pairs take the driver union-find, whose output
    // is a LocalRelation built from collected rows
    val viaDriver = run()
    assert(viaDriver.queryExecution.optimizedPlan.toString
      .contains("LocalRelation"), "expected driver union-find path")
    // conf'd to 0: the same 3 pairs must go through distributed label
    // propagation, whose output is the localCheckpoint'd RDD
    val viaCluster = withConf("graft.dedup.driverMaxPairs", "0")(run())
    assert(viaCluster.queryExecution.optimizedPlan.toString
      .contains("LogicalRDD"), "expected distributed propagation path")
    for (df <- Seq(viaDriver, viaCluster))
      assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        == expected)
  }

  test("graft.lsh.bucketCap=1 switches an over-cap bucket to a star join") {
    import spark.implicits._
    val banded = Seq((0, "x", 1L), (0, "x", 2L), (0, "x", 3L))
      .toDF("band", "bkey", "doc_id")
    def pairs() = Fingerprints.cappedPairs(banded, Seq("band", "bkey"),
      "doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // default cap (1000): bucket of 3 does all-pairs
    assert(pairs() == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // cap 1: the bucket is oversized, only (rep=min, member) star edges
    val star = withConf("graft.lsh.bucketCap", "1")(pairs())
    assert(star == Set((1L, 2L), (1L, 3L)))
  }
}
