package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join,
  LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule that rescues naive band joins: a user who writes
  *
  *   left.join(right, abs(l("ts") − r("ts")) <= lit(δ))
  *
  * gets a BroadcastNestedLoopJoin from Spark — the full pair product,
  * a cluster-killer at any real size. [[graft.operators.BandJoin]]
  * exists as the explicit scale-safe form; this rule teaches Catalyst
  * to apply the SAME δ-bucket rewrite automatically, so the naive
  * spelling plans like the explicit one: quantize both sides into
  * δ-wide buckets, replicate the right side into its own bucket and
  * both neighbors (a qualifying pair's buckets differ by ≤ 1, and
  * EXACTLY one replica carries the left row's bucket — no duplicates,
  * left_outer-safe), join on bucket equality with the original band
  * predicate as residual.
  *
  * Fires only when it is the difference between a product and a hash
  * join: inner / left_outer joins whose condition has a
  * `|a − b| ≤/< δ` conjunct over integral single-side expressions and
  * NO cross-side equality conjunct (with one, Spark already plans a
  * hash join and the band is a cheap residual). The rewritten join
  * carries the bucket equality, so the rule cannot re-fire on its own
  * output.
  */
object BandJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private def isIntegral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** (leftSideExpr, rightSideExpr, δ) for a `|a − b| ≤ δ` or `< δ`
    * conjunct whose operands resolve one per side.
    */
  private def bandConjunct(c: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Long)] = {
    def sides(a: Expression, b: Expression): Option[(Expression, Expression)] =
      if (a.references.subsetOf(left.outputSet) &&
        b.references.subsetOf(right.outputSet)) Some((a, b))
      else if (b.references.subsetOf(left.outputSet) &&
        a.references.subsetOf(right.outputSet)) Some((b, a))
      else None
    val (diff, lim) = c match {
      case LessThanOrEqual(Abs(d, _), l: Literal) => (Some(d), Some(l))
      case LessThan(Abs(d, _), l: Literal) => (Some(d), Some(l))
      case GreaterThanOrEqual(l: Literal, Abs(d, _)) => (Some(d), Some(l))
      case GreaterThan(l: Literal, Abs(d, _)) => (Some(d), Some(l))
      case _ => (None, None)
    }
    for {
      Subtract(a, b, _) <- diff
      if isIntegral(a) && isIntegral(b) && a.deterministic && b.deterministic
      l <- lim
      delta <- l.value match {
        case i: java.lang.Integer => Some(i.longValue)
        case i: java.lang.Long => Some(i.longValue)
        case _ => None
      }
      if delta > 0
      (ls, rs) <- sides(a, b)
    } yield (ls, rs, delta)
  }

  private def hasCrossEquality(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(left.outputSet) && a.references.nonEmpty &&
          b.references.subsetOf(right.outputSet) && b.references.nonEmpty) ||
        (b.references.subsetOf(left.outputSet) && b.references.nonEmpty &&
          a.references.subsetOf(right.outputSet) && a.references.nonEmpty)
      case _ => false
    }

  /** Floor division as exact integer arithmetic (pre-epoch values land
    * in the bucket below zero, same contract as BandJoin.floorDiv).
    */
  private def bucket(e: Expression, delta: Long): Expression = {
    val d = Literal(delta)
    val el = if (e.dataType == LongType) e else Cast(e, LongType)
    IntegralDivide(Subtract(el, Pmod(el, d)), d)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, jt, Some(cond), hint)
        if (jt == Inner || jt == LeftOuter) &&
          left.resolved && right.resolved => {
      val conjuncts = splitConjunctivePredicates(cond)
      if (hasCrossEquality(conjuncts, left, right)) j
      else conjuncts.iterator
        .flatMap(bandConjunct(_, left, right)).take(1).toList match {
        case (ls, rs, delta) :: Nil =>
          val lb = Alias(bucket(ls, delta), "__lband")()
          val newLeft = Project(left.output :+ lb, left)
          val rb0 = Alias(bucket(rs, delta), "__rband0")()
          val rightB = Project(right.output :+ rb0, right)
          val rbAttr = AttributeReference("__rband", LongType,
            nullable = true)()
          val gen = Generate(
            Explode(CreateArray(Seq(
              Subtract(rb0.toAttribute, Literal(1L)),
              rb0.toAttribute,
              Add(rb0.toAttribute, Literal(1L))))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(rbAttr), child = rightB)
          val newCond = And(EqualTo(lb.toAttribute, rbAttr), cond)
          val joined = Join(newLeft, gen, jt, Some(newCond), hint)
          Project(j.output, joined)
        case _ => j
      }
    }
  }
}
