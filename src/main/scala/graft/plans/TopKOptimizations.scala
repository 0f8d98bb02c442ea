package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rules that teach Catalyst about [[TopKPerKey]].
  *
  * A custom logical node is an optimization *barrier* by default: the
  * built-in `PushDownPredicates` and `ColumnPruning` rules only traverse
  * node types they know, so a filter or projection written above
  * `topKPerKey(...)` stops there — the scan below reads every column and
  * every row group even when the query needs two columns of one key range.
  * At 100 TB that is the difference between scanning a partition-pruned
  * two-column slice and scanning the world.
  *
  * Both rules are semantics-preserving:
  *  - a deterministic predicate over only the KEY columns is constant
  *    within each key group, so it drops whole groups — filtering before
  *    the per-group top-k equals filtering after. (Predicates touching
  *    order/payload columns must NOT move: they would change which rows
  *    compete for the k slots.)
  *  - the operator reads only the key and order columns and passes rows
  *    through otherwise, so any child column unused by the parent
  *    projection, the keys, or the sort order can be pruned below it.
  */
object TopKOptimizations {

  /** `Filter(p, TopKPerKey)` → `TopKPerKey(Filter(p_keys))` for the
    * conjuncts of `p` that are deterministic and reference only key
    * attributes; the rest stay above.
    */
  object PushFilterThroughTopK extends Rule[LogicalPlan] with PredicateHelper {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      // SOUND only when every key is a bare Attribute: with an
      // expression key like `a % 10`, a predicate on `a` references only
      // key attributes yet is NOT constant within a key group — pushing
      // it would change which rows compete for the k slots. (The public
      // API always produces Attribute keys; the guard protects plans
      // built directly against the node.)
      case f @ Filter(cond, topk @ TopKPerKey(keys, _, _, child))
          if keys.forall(_.isInstanceOf[
            org.apache.spark.sql.catalyst.expressions.Attribute]) =>
        val keyAttrs = AttributeSet(keys.flatMap(_.references))
        val (push, keep) = splitConjunctivePredicates(cond)
          .partition(p => p.deterministic && p.references.subsetOf(keyAttrs))
        if (push.isEmpty) f
        else {
          val pushed = topk.copy(child = Filter(push.reduce(And), child))
          keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
        }
    }
  }

  /** `Project(cols, TopKPerKey)` → insert `Project(cols ∪ keys ∪ order)`
    * below the operator so pruning continues to the scan.
    */
  object PruneColumnsThroughTopK extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case p @ Project(_, topk @ TopKPerKey(keys, order, _, child))
          if prunable(p, topk).nonEmpty =>
        val dropped = prunable(p, topk)
        p.copy(child = topk.copy(child =
          Project(child.output.filterNot(dropped.contains), child)))
    }

    private def prunable(p: Project, topk: TopKPerKey): AttributeSet =
      topk.child.outputSet -- p.references --
        AttributeSet(topk.keys.flatMap(_.references)) --
        AttributeSet(topk.order.flatMap(_.references))
  }

  /** The engine's rules alone — what [[TopKExtensions]] injects into the
    * main operator-optimization fixed point, where the built-in pushdown
    * and pruning rules pick up where these leave off.
    */
  val rules: Seq[Rule[LogicalPlan]] =
    Seq(PushFilterThroughTopK, PruneColumnsThroughTopK)

  /** Wrapper that fires `rule` only when the plan actually contains a
    * [[TopKPerKey]] node. The live-session batch below carries three
    * BUILT-IN rules; without the guard, registering them via
    * `extraOptimizations` would re-run them at the very end of the
    * optimizer on EVERY subsequent query in the session — paying a
    * fixed-point batch (and running them after cleanup batches they
    * were never designed to follow) on plans that gain nothing.
    */
  private case class OnlyWithTopK(rule: Rule[LogicalPlan])
      extends Rule[LogicalPlan] {
    override val ruleName: String = s"graft.OnlyWithTopK(${rule.ruleName})"
    override def apply(plan: LogicalPlan): LogicalPlan =
      if (plan.exists(_.isInstanceOf[TopKPerKey])) rule(plan) else plan
  }

  /** For LIVE sessions (no `spark.sql.extensions` at build time) the only
    * registration surface is `experimental.extraOptimizations`, which runs
    * as the LAST optimizer batch — after the built-in pushdown/pruning
    * batches have already finished. A filter moved below `TopKPerKey`
    * there would strand just beneath it, so the batch also carries the
    * (idempotent) built-in rules needed to keep driving it down to the
    * scan — `PushDownPredicates`, `ColumnPruning`, `CollapseProject` —
    * each guarded to fire only on plans that contain the custom node.
    */
  val liveSessionRules: Seq[Rule[LogicalPlan]] = rules ++ Seq(
    OnlyWithTopK(org.apache.spark.sql.catalyst.optimizer.PushDownPredicates),
    OnlyWithTopK(org.apache.spark.sql.catalyst.optimizer.ColumnPruning),
    OnlyWithTopK(org.apache.spark.sql.catalyst.optimizer.CollapseProject))
}
