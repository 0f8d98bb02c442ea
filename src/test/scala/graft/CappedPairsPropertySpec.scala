package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Fingerprints

/** Randomized differential properties of [[Fingerprints.cappedPairs]] —
  * the skew guard every LSH candidate path (minhash, simhash, embedding,
  * portable tiers) now routes through, so its algebra deserves direct
  * pinning beyond the per-operator fixtures:
  *
  *  1. with an unreachable cap it IS the plain all-pairs bucket join;
  *  2. for any cap the output is a SUBSET of the all-pairs output
  *     (the star rewrite never invents a candidate);
  *  3. every member of an oversized bucket stays connected to that
  *     bucket's min-id representative (the property that keeps
  *     connected-components dedup finding whole clusters);
  *  4. pairs are canonical (ida < idb) and distinct;
  *  5. the result is a pure function of the data (re-run identical).
  *
  * Trials use seeded uniform and Zipf-skewed bucket assignments so both
  * the all-pairs path and the star path are exercised in every run.
  */
class CappedPairsPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def pairsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def banded(rows: Seq[(Long, Int, Long)]) =
    rows.toDF("doc_id", "band", "bkey")

  private def allPairs(rows: Seq[(Long, Int, Long)]): Set[(Long, Long)] =
    (for {
      (a, ba, ka) <- rows; (b, bb, kb) <- rows
      if ba == bb && ka == kb && a < b
    } yield (a, b)).toSet

  test("10 random configs: subset, star connectivity, canonical form, " +
      "uncapped equivalence, determinism") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 10) {
      val n = 30 + rnd.nextInt(40)
      val buckets = 2 + rnd.nextInt(5)
      // Zipf-ish skew on odd trials: bucket 0 absorbs most members, so
      // small caps force the star path
      val rows = (0 until n).map { i =>
        val b =
          if (trial % 2 == 1 && rnd.nextInt(10) < 6) 0
          else rnd.nextInt(buckets)
        (i.toLong, b % 2, (b / 2).toLong)
      }
      val truth = allPairs(rows)
      val uncapped = pairsOf(Fingerprints.cappedPairs(
        banded(rows), Seq("band", "bkey"), "doc_id", Int.MaxValue))
      assert(uncapped == truth, s"trial $trial: uncapped != all-pairs")
      val cap = 1 + rnd.nextInt(6)
      val df = Fingerprints.cappedPairs(
        banded(rows), Seq("band", "bkey"), "doc_id", cap)
      val capped = pairsOf(df)
      assert(capped.subsetOf(truth), s"trial $trial: invented pairs")
      assert(capped.forall { case (a, b) => a < b },
        s"trial $trial: non-canonical pair")
      assert(df.count() == capped.size, s"trial $trial: duplicates")
      // star connectivity inside every oversized bucket
      rows.groupBy(r => (r._2, r._3)).values
        .filter(_.size > cap)
        .foreach { bucket =>
          val rep = bucket.map(_._1).min
          bucket.map(_._1).filter(_ != rep).foreach { m =>
            assert(capped.contains((rep, m)),
              s"trial $trial: member $m lost its representative $rep")
          }
        }
      val again = pairsOf(Fingerprints.cappedPairs(
        banded(rows), Seq("band", "bkey"), "doc_id", cap))
      assert(again == capped, s"trial $trial: nondeterministic")
    }
  }
}
