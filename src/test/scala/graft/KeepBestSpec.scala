package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Dedup

/** Semantics of the round-3 additions that a hash-match alone can't pin:
  * keepBest tie-breaks and singleton handling, the salted two-phase
  * aggregation's losslessness, and latest-wins upsert on a crafted frame.
  */
class KeepBestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("keepBest: highest score wins, ties go to the smallest doc_id") {
    val docs = Seq(
      (1L, 10L), (2L, 30L), (3L, 30L), // cluster 1: tie at 30 → doc 2
      (7L, 5L)                         // cluster 7 via clusters frame
    ).toDF("doc_id", "n_chars")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L))
      .toDF("doc_id", "cluster")
    val out = Dedup.keepBest(docs, clusters, "n_chars")
      .orderBy("cluster")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 3L), (7L, 7L, 1L)))
  }

  test("keepBest: docs absent from the cluster frame are singletons") {
    val docs = Seq((4L, 9L), (5L, 1L)).toDF("doc_id", "n_chars")
    val clusters = Seq.empty[(Long, Long)].toDF("doc_id", "cluster")
    val out = Dedup.keepBest(docs, clusters, "n_chars")
      .orderBy("cluster")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((4L, 4L, 1L), (5L, 5L, 1L)))
  }

  test("two-phase salted agg equals the direct group-by") {
    val sf = "/root/testdata/sf0.001"
    val direct = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n_items"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    val two = SparkEntry.queries("r_agg_twophase")(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    assert(two == direct)
  }

  test("merge upsert: update rows win, untouched keys keep version 1") {
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("r_merge_upsert")(spark, sf)
    val byKey = out.collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getInt(2))).toMap
    val base = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byKey.size == base.size) // one row per key, no dangling versions
    for ((k, price) <- base) {
      if (k % 7 == 0) assert(byKey(k) == (price * 2, 2), s"key $k")
      else assert(byKey(k) == (price, 1), s"key $k")
    }
  }
}
