package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType,
  StructField, StructType, TimestampType}

import graft.pipeline.Preference
import graft.streaming.IncrementalDedupStream.readPartsWithBatch

/** Streaming twin of `p_preference_pairs` / `p_preference_rank` — the
  * pairwise-preference aggregates maintained as comparison events
  * ARRIVE. Match counts are NOT additive across an arbitrary stream
  * split (a (user, day) group's matches pair events that may land in
  * different micro-batches), so unlike the mix/CMS twins the state here
  * is not the aggregate: it is the CAPPED EVENT SET each group's
  * matches derive from.
  *
  * What makes that bounded is the cap's algebra: the batch operator
  * pairs each group's 16 SMALLEST events by (ts, event_id), and
  * k-smallest is a semilattice — k-smallest(A ∪ B) =
  * k-smallest(k-smallest(A) ∪ k-smallest(B)). So each micro-batch
  * persists only its batch-local 16-per-group (lossless by the merge
  * law), the view re-derives the global capped sets and aggregates
  * through the SAME [[Preference.pairMatrix]]/[[Preference.typeRank]]
  * the batch operator runs — stream ≡ batch EXACTLY under ANY split,
  * including a late-arriving small-(ts, id) event that retroactively
  * DISPLACES a previously-paired event from its group's capped set
  * (aggregate state could never unwind the displaced event's matches;
  * the event-set state just stops deriving them). Emissions land in
  * `batch=<id>` overwrite partitions (the family's idempotent replay
  * discipline), and [[compact]] folds committed partitions into one
  * 16-per-group partition — the same merge law, applied at rest — so
  * steady-state storage is ≤ 16·|active groups| + the newest batch.
  */
object PreferenceStream {
  private val Cap = 16

  private val EvSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def capPerGroup(events: DataFrame): DataFrame = {
    // MUST match Preference.matches's day bucket exactly (floor
    // division on microseconds) — the capped sets the views re-derive
    // from are per (user, day), so a different day boundary here would
    // cap different events than the batch operator pairs
    val day = graft.TimeBuckets.epochDay()
    val w = Window.partitionBy(col("user_id"), day)
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= Cap)
      .drop("rn")
  }

  /** Ingest one micro-batch of raw events. Public so the spec drives
    * the identical body without a stream (the family convention); wire
    * via `foreachBatch(ingestBatch(_, _, path))`.
    */
  def ingestBatch(events: DataFrame, batchId: Long,
      outPath: String): Unit =
    capPerGroup(events)
      .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")

  private def allEvents(spark: SparkSession, outPath: String): DataFrame =
    readPartsWithBatch(spark, outPath, -1L, EvSchema)
      .drop("batch")

  /** The stream's current answer — shaped exactly like
    * `p_preference_pairs` (the win-rate matrix). `pairMatrix` re-caps
    * the unioned per-batch sets itself, which is precisely the
    * semilattice merge.
    */
  def pairsView(spark: SparkSession, outPath: String): DataFrame =
    Preference.pairMatrix(allEvents(spark, outPath))

  /** The leaderboard view — shaped exactly like `p_preference_rank`. */
  def rankView(spark: SparkSession, outPath: String): DataFrame =
    Preference.typeRank(allEvents(spark, outPath))

  /** The uncertainty-aware leaderboard — shaped exactly like
    * `a_preference_ci`. The Poisson-bootstrap replicate weights are
    * deterministic functions of each match's (ea, eb, replicate)
    * identity, and matches are re-derived from the capped event sets,
    * so the CI inherits the k-smallest merge law for free: no
    * per-(type, replicate) additive state is ever persisted, the
    * replicate frame (|types|·64 rows) is recomputed from the same
    * state the win-rate views read.
    */
  def ciView(spark: SparkSession, outPath: String): DataFrame =
    Preference.rankCi(allEvents(spark, outPath))

  /** Wire the twin to a real stream (the family convention). */
  def start(events: DataFrame, root: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val body: (DataFrame, Long) => Unit =
      (b, id) => ingestBatch(b, id, root)
    events.writeStream
      .foreachBatch(body)
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** Fold every partition EXCEPT the newest into one 16-per-group
    * partition (the newest may be an uncommitted in-flight batch whose
    * id a replay would reuse — folding it would make replay exclude
    * history; strictly-older parts are necessarily committed). Lossless
    * for every view by the k-smallest merge law. Crash-safe via the
    * shared [[CompactSwap.foldCompact]] `.SWAP`-marker protocol
    * (crash-boundary matrix spec'd in PreferenceStreamSpec against the
    * shared utility).
    */
  def compact(spark: SparkSession, outPath: String): Unit =
    CompactSwap.foldCompact(spark, outPath) { fold =>
      capPerGroup(spark.read.schema(EvSchema).parquet(fold: _*))
    }
}
