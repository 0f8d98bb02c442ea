package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical._

/** Registry-wide DIAMOND LINTER — makes the diamond-reuse rule
  * structural instead of enumerated.
  *
  * The rule (pinned at Agreement's pairDrift, gated per-query by
  * ExplainAudit.auditDiamond since round 11): a frame that feeds two or
  * more consumers in one query must be lazily persisted, or its
  * dominant pass executes once per consumer. Rounds 10 and 11 found
  * violations piecemeal — three, then six more — because the gates
  * were an enumerated list. This linter walks EVERY registered query's
  * optimized logical plan and flags any duplicate compute-bearing
  * subtree that still reads a file relation (i.e. is not cache-backed):
  *
  *  - duplicate = the same canonicalized subtree appears ≥ 2 times in
  *    one query's optimized plan (subquery plans included);
  *  - compute-bearing = the subtree contains a Generate (explode),
  *    Aggregate, Join, or Window — re-executing one of those per
  *    consumer is the waste class; a bare re-scan of a parquet leaf
  *    (dimension tables, second projections of the fact table) is NOT
  *    flagged, because scans are cheap relative to recompute and the
  *    columnar reader prunes them independently per consumer;
  *  - not cache-backed = the subtree still contains a file relation
  *    leaf. A persisted diamond is substituted by the CacheManager at
  *    planning time, so its duplicate branches contain InMemoryRelation
  *    leaves, not file scans — exactly the evidence auditDiamond counts
  *    in the physical plan, read here at the logical level so the whole
  *    registry can be swept without executing it.
  *
  * Only MAXIMAL duplicates are reported (a duplicated parent subsumes
  * its duplicated children). Queries listed in [[waivers]] may keep a
  * duplicate with the documented reason; anything else fails the sweep
  * (ExplainAudit runs it and DiamondLintSpec keeps the waiver list
  * honest — a stale waiver fails the build).
  *
  * Known limitation, documented rather than papered over: queries that
  * EXECUTE at construction time and return a driver-local or
  * checkpointed frame (the dupClusters small-graph path, trained-model
  * scorers) expose only their final relation here; their internal
  * diamonds are covered by the per-query auditDiamond gates on the
  * lineages they share (e.g. d_dup_clusters runs the exact
  * d_ngram_jaccard_capped pair lineage, gated in ExplainAudit).
  */
object DiamondLint {

  /** Every node of `plan`, subquery plans included. */
  private def walk(p: LogicalPlan)(f: LogicalPlan => Unit): Unit = {
    f(p)
    p.children.foreach(walk(_)(f))
    p.subqueries.foreach(walk(_)(f))
  }

  /** A leaf that re-reads primary storage when duplicated. Matched by
    * class name so both DSv1 and DSv2 read paths count; cached
    * (InMemoryRelation), driver-local (LocalRelation/LogicalRDD) and
    * Range leaves deliberately do not.
    */
  private def isFileScan(p: LogicalPlan): Boolean =
    p.getClass.getSimpleName match {
      case "LogicalRelation" | "DataSourceV2Relation" |
          "DataSourceV2ScanRelation" | "StreamingRelation" |
          "HiveTableRelation" => true
      case _ => false
    }

  private def isCompute(p: LogicalPlan): Boolean = p match {
    case _: Generate | _: Aggregate | _: Join | _: Window => true
    case _ => false
  }

  /** Maximal duplicate compute-bearing scan-bearing subtrees of `plan`
    * with their occurrence counts.
    */
  def findDiamonds(plan: LogicalPlan): Seq[(LogicalPlan, Int)] = {
    val counts = scala.collection.mutable.LinkedHashMap
      .empty[LogicalPlan, (LogicalPlan, Int)]
    walk(plan) { p =>
      val c = p.canonicalized
      counts.get(c) match {
        case Some((rep, n)) => counts.update(c, (rep, n + 1))
        case None => counts.update(c, (p, 1))
      }
    }
    val dup = counts.collect {
      case (c, (rep, n)) if n >= 2 && rep.exists(isCompute) &&
          rep.exists(isFileScan) =>
        (c, rep, n)
    }.toSeq
    // maximality: drop any duplicate whose canonical form occurs as a
    // strict descendant of another duplicate's representative
    val shadowed = scala.collection.mutable.Set.empty[LogicalPlan]
    for ((_, rep, _) <- dup)
      walk(rep)(q => if (q ne rep) shadowed += q.canonicalized)
    dup.collect { case (c, rep, n) if !shadowed.contains(c) => (rep, n) }
  }

  /** Queries allowed to keep a duplicate subtree, with the audited
    * reason. DiamondLintSpec fails on a STALE entry (waived query no
    * longer flags), so the list can only shrink truthfully.
    */
  val waivers: Map[String, String] = Map.empty

  /** One line per finding: (query, occurrences, subtree head). */
  def lint(spark: SparkSession, dir: String,
      only: Option[Set[String]] = None): Seq[(String, Int, String)] = {
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    names.flatMap { name =>
      // clear BEFORE construction so (a) the previous query's caches
      // can't substitute into this plan and mask or fake cache-backing,
      // (b) this query's own lazy persists DO substitute — which is the
      // cache-backing evidence the linter accepts
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      try {
        val plan = SparkEntry.queries(name)(spark, dir)
          .queryExecution.optimizedPlan
        findDiamonds(plan).map { case (rep, n) =>
          (name, n, rep.nodeName + " " +
            rep.simpleString(20).linesIterator.next().take(160))
        }
      } catch {
        case e: Throwable =>
          Seq((name, -1, s"LINT ERROR: ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).take(160)))
      }
    }
  }

  /** Sweep the registry; print findings; exit 1 on any unwaived one. */
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = sys.env.get("SPARK_GRAFT_LINT_ONLY").map(_.split(",").toSet)
    val findings = lint(spark, dir, only)
    val (waived, hard) = findings.partition(f => waivers.contains(f._1))
    for ((q, n, head) <- waived)
      println(s"DIAMOND WAIVED $q ($n×): $head\n  reason: ${waivers(q)}")
    for ((q, n, head) <- hard)
      println(s"DIAMOND $q ($n×): $head")
    println(s"DIAMOND LINT: ${hard.size} unwaived, ${waived.size} waived, " +
      s"${SparkEntry.queries.size} queries")
    spark.stop()
    if (hard.nonEmpty) sys.exit(1)
  }
}
