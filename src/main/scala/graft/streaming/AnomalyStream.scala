package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.pipeline.EventWindows.hourlyAnomalies]]:
  * per-type hourly event-rate anomaly flags maintained incrementally
  * over an unbounded stream.
  *
  * State per event type is the full hour→count map seen so far; every
  * batch folds its arrivals in and re-derives the type's flag table.
  * Keeping the counts — not just the latest flags — is what makes the
  * operator EXACT under arbitrary batch splits and arrival order: a
  * late event landing in a BASELINE hour changes that baseline's
  * variance and can flip a later hour's flag retroactively (the spec
  * plants exactly that), which a flags-only state could never recover.
  * State is bounded by observed hours per type (~9k/year); a deployment
  * that can declare hours final ages them out with a watermark-driven
  * timer, trading exactly this recovery away.
  *
  * Emits the type's current flag table after every batch that touched
  * the type (update semantics — downstream upserts by (type, hour)).
  * The flag test is the shared integer two-sigma contract: see
  * [[flags]].
  */
object AnomalyStream {
  case class CountEvent(eventType: String, tsSec: Long)
  case class HourFlag(eventType: String, hourBucket: Long, n: Long,
      baselineSum: Option[Long], flagged: Boolean)

  /** Flag derivation shared by the operator and the spec's sequential
    * ground truth — the same division-free two-sigma population z-test
    * as the batch operator, (b·n−S)² > σ²·(b·S2−S²) over the trailing
    * `baseline` OBSERVED hours, on BigInt so the squares can't wrap.
    * Hours with an incomplete baseline emit (None, false).
    */
  def flags(counts: Map[Long, Long], baseline: Int,
      sigmas: Int): Seq[(Long, Long, Option[Long], Boolean)] = {
    val hours = counts.keys.toSeq.sorted
    hours.zipWithIndex.map { case (h, i) =>
      val n = counts(h)
      if (i < baseline) (h, n, None, false)
      else {
        val xs = hours.slice(i - baseline, i).map(counts)
        val s = xs.sum
        val s2 = xs.map(x => BigInt(x) * x).sum
        val lhs = BigInt(baseline) * n - s
        val rhs = BigInt(baseline) * s2 - BigInt(s) * s
        (h, n, Some(s), lhs * lhs > BigInt(sigmas) * sigmas * rhs)
      }
    }
  }

  def hourlyFlags(ds: Dataset[CountEvent], spark: SparkSession,
      baseline: Int = 24, sigmas: Int = 2): Dataset[HourFlag] = {
    import spark.implicits._
    ds.groupByKey(_.eventType)
      .flatMapGroupsWithState[Map[Long, Long], HourFlag](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (typ, rows, state) =>
          val cur = state.getOption.getOrElse(Map.empty[Long, Long])
          val next = rows.foldLeft(cur) { (acc, e) =>
            val h = Math.floorDiv(e.tsSec, 3600L)
            acc.updated(h, acc.getOrElse(h, 0L) + 1L)
          }
          state.update(next)
          flags(next, baseline, sigmas).iterator.map {
            case (h, n, bs, f) => HourFlag(typ, h, n, bs, f)
          }
      }
  }
}
