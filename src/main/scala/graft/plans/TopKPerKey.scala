package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.SparkSessionExtensions

/** Per-key top-K as a CUSTOM whole operator — logical node, planner
  * strategy, physical exec (SURVEY §7 preference tier (c), demonstrated on
  * the one shape where composition is measurably wasteful).
  *
  * The composable formulation (`row_number().over(partitionBy(key)
  * .orderBy(ord)) <= k`) must SORT every partition fully before discarding
  * all but k rows per key. This operator instead keeps a bounded k-row
  * heap per key: memory O(keys·k) instead of sort buffers over the whole
  * partition, no sort spill, and rows stream through once. At 100 TB
  * (per-shard batch caps, per-user top-N) the difference is a full
  * sort-exchange stage versus a streaming pass.
  *
  * Physical contract: `requiredChildDistribution = ClusteredDistribution
  * (keys)` — Catalyst inserts the hash exchange only if the child isn't
  * already partitioned by the key (e.g. already bucketed ⇒ zero shuffle).
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  // empty keys would only fail much later inside ClusteredDistribution's
  // own require (with no hint it came from here); empty order would make
  // the heap keep an ARBITRARY k rows per key with no error at all
  require(keys.nonEmpty, "topKPerKey needs at least one key column " +
    "(for global top-k use orderBy().limit() — TakeOrderedAndProject)")
  require(order.nonEmpty, "topKPerKey needs at least one order column")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

object TopKPerKey {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}
  import org.apache.spark.sql.graftshim.Bridge

  /** API: smallest `k` rows per key under `order`; `(name, true)` orders
    * that column descending (largest-first). Attributes are resolved
    * against the analyzed child plan (Column objects would reach the
    * custom node as lazy unresolved ColumnNode wrappers the analyzer
    * doesn't traverse). Registers the strategy on the session on first
    * use.
    */
  def topKPerKey(df: DataFrame, keys: Seq[String],
      order: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    Bridge.addStrategy(spark, TopKPerKeyStrategy)
    Bridge.addOptimizations(spark, TopKOptimizations.liveSessionRules)
    val analyzed = df.queryExecution.analyzed
    // honor spark.sql.caseSensitive, and REFUSE ambiguity: after a join
    // two attributes can share a name, and silently binding the first
    // would rank every group by the wrong column
    val caseSensitive =
      spark.conf.get("spark.sql.caseSensitive", "false").toBoolean
    def attr(n: String) = {
      val matches = analyzed.output.filter(a =>
        if (caseSensitive) a.name == n else a.name.equalsIgnoreCase(n))
      if (matches.isEmpty) throw new IllegalArgumentException(
        s"column '$n' not in ${analyzed.output.map(_.name)}")
      if (matches.length > 1) throw new IllegalArgumentException(
        s"column '$n' is ambiguous (${matches.length} matches) — " +
          "alias the inputs before topKPerKey")
      matches.head
    }
    val sortOrders = order.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending) }
    Bridge.ofRows(spark,
      TopKPerKey(keys.map(attr), sortOrders, k, analyzed))
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  // per-key filtering preserves the child's partitioning: downstream
  // operators clustered on the same keys (e.g. a rank window) must NOT
  // re-shuffle. Without this override the default UnknownPartitioning
  // inserted a second identical hash Exchange above every use.
  override def outputPartitioning:
      org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val ordExprs = order
    // grouping compares raw UnsafeRow bytes, so float/double keys must
    // be normalized (-0.0 == 0.0, one canonical NaN) exactly as Spark's
    // NormalizeFloatingNumbers rule does for built-in Aggregate/Join —
    // a custom node doesn't get that rule applied for free
    val keyExprs = keys.map { k =>
      k.dataType match {
        case org.apache.spark.sql.types.FloatType |
            org.apache.spark.sql.types.DoubleType =>
          org.apache.spark.sql.catalyst.optimizer.NormalizeNaNAndZero(k)
        case _ => k
      }
    }
    val kk = k
    child.execute().mapPartitions { rows =>
      // key → bounded max-heap of the k smallest under `order`
      val ordering = new LazilyGeneratedOrdering(ordExprs, schema)
      val heapOrd = ordering.reverse // max-heap: evict the largest
      val keyProj = UnsafeProjection.create(keyExprs, schema)
      val heaps = new java.util.HashMap[UnsafeRow,
        java.util.PriorityQueue[UnsafeRow]]()
      rows.foreach { r =>
        val key = keyProj(r)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](kk + 1,
            (a: UnsafeRow, b: UnsafeRow) => heapOrd.compare(a, b))
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kk) {
          heap.add(r.asInstanceOf[UnsafeRow].copy())
        } else if (ordering.compare(r, heap.peek()) < 0) {
          heap.poll()
          heap.add(r.asInstanceOf[UnsafeRow].copy())
        }
      }
      val out = Seq.newBuilder[InternalRow]
      heaps.values().forEach { h =>
        // drain in `order` (heap is reverse-ordered)
        val buf = new scala.collection.mutable.ArrayBuffer[UnsafeRow](h.size)
        while (!h.isEmpty) buf += h.poll()
        out ++= buf.reverseIterator
      }
      out.result().iterator
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Session extensions registering the strategy; combine with
  * `graft.functions.GraftExtensions` or list both under
  * `spark.sql.extensions`.
  */
class TopKExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    // inside the main operator-optimization fixed point the built-in
    // pushdown/pruning rules compose with these, so only the engine's own
    // rules are injected here (vs the live-session late-batch set)
    TopKOptimizations.rules.foreach(r => e.injectOptimizerRule(_ => r))
  }
}
