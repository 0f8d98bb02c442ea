package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IntervalJoin

/** Boundary semantics of the bucket-replicated interval-overlap join:
  * exactly-once matching across shared buckets, closed-endpoint
  * boundaries, the long-interval case point-band machinery can't
  * express, and the fail-loud replication guard.
  */
class IntervalJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val W = 100L // bucket width, us

  private def join(l: Seq[(Long, Long, Long)], r: Seq[(Long, Long, Long)],
      maxReplicas: Int = 64) =
    IntervalJoin.intervalOverlapJoin(
        l.toDF("lid", "ls", "le"), r.toDF("rid", "rs", "re"),
        "ls", "le", "rs", "re", W, maxReplicas)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq

  test("a pair sharing several buckets matches exactly once") {
    // [0, 350] and [50, 320] share buckets 0..3
    assert(join(Seq((1L, 0L, 350L)), Seq((9L, 50L, 320L))) ==
      Seq((1L, 9L)))
  }

  test("closed endpoints: touching intervals match, 1 us apart do not") {
    assert(join(Seq((1L, 0L, 100L)), Seq((9L, 100L, 150L))) ==
      Seq((1L, 9L)))
    assert(join(Seq((1L, 0L, 100L)), Seq((9L, 101L, 150L))).isEmpty)
  }

  test("starts many buckets apart still match when the long side " +
      "reaches — the case point-band bucketing cannot express") {
    // left covers buckets 0..9; right sits in bucket 9 only
    assert(join(Seq((1L, 0L, 999L)), Seq((9L, 950L, 960L))) ==
      Seq((1L, 9L)))
    // and one bucket past the end: no match
    assert(join(Seq((1L, 0L, 999L)), Seq((9L, 1100L, 1110L))).isEmpty)
  }

  test("pre-epoch (negative) spans bucket and match correctly") {
    assert(join(Seq((1L, -250L, -90L)), Seq((9L, -120L, -100L))) ==
      Seq((1L, 9L)))
    assert(join(Seq((1L, -250L, -150L)), Seq((9L, -120L, -100L))).isEmpty)
  }

  test("an interval covering more than maxReplicas buckets fails loud") {
    val e = intercept[Exception] {
      join(Seq((1L, 0L, 10L * W)), Seq((9L, 0L, 10L)), maxReplicas = 4)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("IntervalJoin")))
  }

  test("an inverted interval (end < start) fails loud instead of " +
      "silently replicating backward through sequence's -1 step") {
    val e = intercept[Exception] {
      join(Seq((1L, 5L * W, 0L)), Seq((9L, 0L, 10L)))
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("IntervalJoin")))
  }

  test("registered fixture query: counts match a naive cross-filter " +
      "and zero-overlap purchases survive") {
    val l = Seq((1L, 0L, 100L), (2L, 5000L, 5100L))
    val r = Seq((7L, 50L, 60L), (8L, 90L, 200L), (9L, 9000L, 9010L))
    val pairs = join(l, r)
    val naive = for {
      (li, ls, le) <- l; (ri, rs, re) <- r
      if math.max(ls, rs) <= math.min(le, re)
    } yield (li, ri)
    assert(pairs == naive.sorted)
  }
}
