package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Registry-wide DIAMOND LINTER — makes the diamond-reuse rule
  * structural instead of enumerated.
  *
  * The rule (pinned at Agreement's pairDrift, gated per-query by
  * ExplainAudit.auditDiamond since round 11): a frame that feeds two or
  * more consumers in one query must execute once — via a lazy persist
  * or physical exchange reuse — or its dominant pass runs once per
  * consumer. Rounds 10 and 11 found violations piecemeal because the
  * gates were an enumerated list; this linter sweeps EVERY registered
  * query.
  *
  * Two phases, because the logical plan alone cannot decide the rule
  * (round 12's first cut flagged 36 false positives by judging it):
  *
  * 1. STRUCTURAL (cheap, no execution): walk the optimized logical
  *    plan (subqueries included) for duplicate compute-bearing
  *    subtrees that still read a file relation.
  *     - duplicate = the same canonicalized subtree appears ≥ 2 times;
  *     - compute-bearing = contains a Generate (explode), Aggregate,
  *       Join, or Window — re-executing one of those per consumer is
  *       the waste class; a bare re-scan of a parquet leaf is NOT
  *       flagged (scans are cheap relative to recompute and the
  *       columnar reader prunes them independently per consumer);
  *     - not cache-backed = still contains a file-relation leaf (a
  *       persisted diamond is substituted by the CacheManager at
  *       planning time, so its branches read InMemoryRelation instead).
  *    Only MAXIMAL duplicates are reported (a duplicated parent
  *    subsumes its duplicated children).
  *
  * 2. PHYSICAL ADJUDICATION (only for queries phase 1 flags): execute
  *    the query at lint scale and re-run the duplicate detection on the
  *    FINAL adaptive physical plan, attributed PER SUBTREE
  *    ([[physicalDuplicates]]): a duplicate compute-bearing subtree
  *    that still contains a file scan executed more than once — the
  *    violation itself, not a proxy count. Legitimate reuse vanishes
  *    structurally: a persisted diamond's branches read
  *    InMemoryTableScan (no file scan inside), an exchange-reused
  *    duplicate is a ReusedExchange LEAF (no subtree to duplicate), an
  *    identity-shared AQE stage counts once. Per-subtree attribution
  *    replaced the first cut's pooled `reused + cached ≥ Σ(n−1)`
  *    check, whose surplus evidence from one persisted diamond could
  *    mask another diamond's genuine re-execution (the round-13 review
  *    finding; DiamondLintSpec seeds exactly that masking pair).
  *
  * Queries listed in [[waivers]] may keep an adjudicated finding with
  * the documented reason. Enforcement: `runMain graft.DiamondLint`
  * sweeps the registry and exits 1 on any unwaived adjudicated finding
  * (run per-round; the green-run artifact is committed as
  * `DIAMONDLINT_r{N}.txt`), and DiamondLintSpec keeps the machinery
  * honest in `sbt test` — it proves the linter catches a seeded
  * unpersisted diamond, passes the same diamond once persisted, and
  * fails on a STALE waiver (a waived query that no longer flags), so
  * the waiver list can only shrink truthfully.
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

  /** One adjudicated violation: a duplicate compute subtree whose extra
    * executions are NOT covered by physical reuse evidence.
    */
  final case class Finding(query: String, occurrences: Int, head: String,
      reusedExchange: Int, cachedReads: Int, required: Int) {
    def render: String =
      s"DIAMOND $query (${occurrences}×): $head " +
        s"[evidence reused=$reusedExchange cached=$cachedReads " +
        s"< required=$required]"
  }

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

  /** Phase 1: maximal duplicate compute-bearing scan-bearing subtrees
    * of `plan` with their occurrence counts.
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

  /** Phase 2 evidence: (ReusedExchange, cached-read) counts in the
    * final adaptive physical plan of an EXECUTED DataFrame. Informational
    * in [[Finding]] renders; the VERDICT comes from
    * [[physicalDuplicates]], which attributes per subtree.
    */
  def reuseEvidence(df: DataFrame): (Int, Int) = {
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec =>
        // guard, not call-order contract (r13 ADVICE): on a
        // not-yet-executed frame the initial adaptive plan carries no
        // ReusedExchange/TableCacheQueryStage nodes and the counts
        // silently read zero — execute first if the plan isn't final.
        // Execute WITHOUT driver materialization (r14 ADVICE): toRdd
        // runs the same physical plan (finalizing AQE) and foreach
        // discards rows on the executors, where collect() would pull
        // the full result onto the driver — on a large frame the lint
        // itself could OOM even though only the plan string is needed.
        if (!a.isFinalPlan) df.queryExecution.toRdd.foreach(_ => ())
        a.executedPlan.toString
      case p => p.toString
    }
    ("ReusedExchange".r.findAllIn(plan).size,
      "InMemoryTableScan|TableCacheQueryStage".r.findAllIn(plan).size)
  }

  private def isComputeP(p: execution.SparkPlan): Boolean = {
    val n = p.getClass.getSimpleName
    n.contains("Aggregate") || n == "GenerateExec" ||
      n.contains("Join") || n.contains("CartesianProduct") ||
      n.contains("Window")
  }

  private def isFileScanP(p: execution.SparkPlan): Boolean = {
    val n = p.getClass.getSimpleName
    n.startsWith("FileSourceScan") || n.startsWith("BatchScan") ||
      n.startsWith("RowDataSourceScan")
  }

  /** Structural children for the physical walk: descend INTO query
    * stages (their materialized plans are where the compute lives —
    * QueryStageExec is a leaf to TreeNode), and stop at ReusedExchange
    * (a reference to an exchange executed elsewhere, not a re-execution)
    * and at InMemoryTableScan (a cache READ; the cached plan executed
    * once at materialization).
    */
  private def childrenP(p: execution.SparkPlan): Seq[execution.SparkPlan] =
    p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(q.plan)
      case r if r.getClass.getSimpleName.startsWith("ReusedExchange") => Nil
      case _ => p.children
    }

  private def walkP(p: execution.SparkPlan,
      seen: java.util.Set[execution.SparkPlan])(
      f: execution.SparkPlan => Unit): Unit = {
    // identity dedup: a subtree OBJECT shared by two parents (AQE stage
    // reuse, shared cached plans) executes once — count it once
    if (!seen.add(p)) return
    f(p)
    childrenP(p).foreach(walkP(_, seen)(f))
    p.subqueries.foreach(walkP(_, seen)(f))
  }

  private def containsP(p: execution.SparkPlan)(
      pred: execution.SparkPlan => Boolean): Boolean = {
    if (pred(p)) return true
    // subqueries too (walkP parity — r13 ADVICE): a duplicate subtree
    // whose only file scan sits inside a DPP/scalar subquery must still
    // satisfy the file-scan-bearing test
    childrenP(p).exists(containsP(_)(pred)) ||
      p.subqueries.exists(containsP(_)(pred))
  }

  /** Phase 2 verdict: maximal duplicate compute-bearing, file-scan-
    * bearing subtrees of the EXECUTED physical plan — attributed PER
    * SUBTREE, so reuse evidence on one diamond can never mask genuine
    * re-execution of another (the pooled-count false negative).
    * Legitimate reuse vanishes here by construction: a persisted
    * diamond's branches read InMemoryTableScan (no file scan inside), an
    * exchange-reused duplicate is a ReusedExchange leaf (no subtree),
    * and an identity-shared stage counts once.
    */
  def physicalDuplicates(df: DataFrame)
      : Seq[(execution.SparkPlan, Int)] = {
    df.collect()
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[execution.SparkPlan, java.lang.Boolean]())
    val counts = scala.collection.mutable.LinkedHashMap
      .empty[execution.SparkPlan, (execution.SparkPlan, Int)]
    walkP(root, seen) { p =>
      // an occurrence only counts if ITS OWN physical subtree reaches a
      // file scan: canonicalization sees through QueryStageExec and
      // ReusedExchange (both canonicalize to the underlying exchange
      // plan), so a consumer whose branch bottoms out in a reused
      // exchange is canonically equal to the original — but it re-runs
      // only the post-exchange work, which is reuse working as intended,
      // not a re-executed scan+compute pass
      if (containsP(p)(isFileScanP)) {
        val c = p.canonicalized
        counts.get(c) match {
          case Some((rep, n)) => counts.update(c, (rep, n + 1))
          case None => counts.update(c, (p, 1))
        }
      }
    }
    val dup = counts.collect {
      case (c, (rep, n)) if n >= 2 && containsP(rep)(isComputeP) =>
        (c, rep, n)
    }.toSeq
    val shadowed = scala.collection.mutable.Set
      .empty[execution.SparkPlan]
    for ((_, rep, _) <- dup)
      walkP(rep, java.util.Collections.newSetFromMap(
        new java.util.IdentityHashMap[execution.SparkPlan,
          java.lang.Boolean]()))(q =>
        if (q ne rep) shadowed += q.canonicalized)
    dup.collect { case (c, rep, n) if !shadowed.contains(c) => (rep, n) }
  }

  /** Queries allowed to keep an adjudicated duplicate subtree, with the
    * audited reason. DiamondLintSpec fails on a STALE entry (a waived
    * query that no longer flags), so the list can only shrink
    * truthfully.
    */
  val waivers: Map[String, String] = Map.empty
  // Round-13 adjudication of round 12's 36 raw structural findings:
  // 35 were physical-reuse false positives (ReusedExchange or
  // construction-time persists collapse the duplicates at runtime —
  // including the suspected d_minhash_lsh/d_simhash sketch aggregations
  // and all three s_margin_mining duplicates, whose exchanges reuse);
  // the one genuine re-execution, t_heavy_hitters' token explode, was
  // FIXED by persisting the stream (TextAnalysis.scala, gated by
  // auditDiamond). Nothing needed a waiver.

  /** Lint one constructed DataFrame (phase 1 + phase 2). Exposed for
    * DiamondLintSpec's seeded synthetic diamonds.
    */
  def lintFrame(name: String, df: DataFrame): Seq[Finding] = {
    val diamonds = findDiamonds(df.queryExecution.optimizedPlan)
    if (diamonds.isEmpty) Nil
    else {
      // phase 1 is only the cheap TRIGGER; the verdict is the physical
      // per-subtree attribution (a pooled reused+cached >= required
      // count let one persisted diamond's surplus evidence mask another
      // diamond's genuine re-execution — the round-13 review finding)
      val required = diamonds.map(_._2 - 1).sum
      val physical = physicalDuplicates(df) // executes the frame
      val (reused, cached) = reuseEvidence(df)
      physical.map { case (rep, n) =>
        Finding(name, n, rep.nodeName + " " +
          rep.simpleString(20).linesIterator.next().take(160),
          reused, cached, required)
      }
    }
  }

  /** Sweep the registry (or `only`); adjudicated findings only. */
  def lint(spark: SparkSession, dir: String,
      only: Option[Set[String]] = None): Seq[Finding] = {
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    names.flatMap { name =>
      // clear BEFORE construction so (a) the previous query's caches
      // can't substitute into this plan and mask or fake cache-backing,
      // (b) this query's own lazy persists DO substitute — which is the
      // cache-backing evidence phase 2 counts
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      try lintFrame(name, SparkEntry.queries(name)(spark, dir))
      catch {
        case e: Throwable =>
          Seq(Finding(name, -1, s"LINT ERROR: ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).take(160), 0, 0, 0))
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
    val (waived, hard) = findings.partition(f => waivers.contains(f.query))
    for (f <- waived)
      println(s"WAIVED ${f.render}\n  reason: ${waivers(f.query)}")
    for (f <- hard) println(f.render)
    println(s"DIAMOND LINT: ${hard.size} unwaived, ${waived.size} waived, " +
      s"${SparkEntry.queries.size} queries")
    spark.stop()
    if (hard.nonEmpty) sys.exit(1)
  }
}
