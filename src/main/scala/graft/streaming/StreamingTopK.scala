package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming per-key top-k via `mapGroupsWithState` — the streaming twin
  * of `plans.TopKPerKey` (same bounded-heap idea, applied to an unbounded
  * input): state per key is just its current k best scores, each
  * micro-batch folds new arrivals in O(batch + k·log k), and nothing ever
  * re-reads or re-sorts history. The streaming leaderboard shape — at
  * 100 TB/day the alternative (windowed re-aggregation over raw events)
  * re-shuffles the full retained stream every trigger, while this carries
  * O(keys · k) state total, irrespective of how many events ever arrived.
  *
  * Emits each key's CURRENT top-k after every batch that touched the key
  * (update semantics — downstream upserts by key). Determinism: the fold
  * is a commutative merge (sort-desc-take-k over a set of scores), so
  * batch boundaries and arrival order cannot change a key's final top-k.
  */
object StreamingTopK {
  case class Scored(key: Long, score: Long)
  case class TopK(key: Long, topScores: Seq[Long])

  /** Merge new scores into a k-bounded descending score list. Shared by
    * the operator and its spec's sequential ground-truth simulation.
    */
  def fold(prior: Seq[Long], incoming: Iterator[Long], k: Int): Seq[Long] =
    (prior ++ incoming).sorted(Ordering[Long].reverse).take(k)

  def topKPerKey(ds: Dataset[Scored], k: Int, spark: SparkSession)
      : Dataset[TopK] = {
    import spark.implicits._
    ds.groupByKey(_.key)
      .mapGroupsWithState[Seq[Long], TopK](GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[Seq[Long]]) =>
          val next = fold(state.getOption.getOrElse(Nil),
            rows.map(_.score), k)
          state.update(next)
          TopK(key, next)
      }
  }
}
