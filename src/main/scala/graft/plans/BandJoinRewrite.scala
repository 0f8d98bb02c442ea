package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join,
  LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DayTimeIntervalType, IntegerType,
  LongType, TimestampType}

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
  * join: inner / left_outer joins whose condition bounds `a − b` in
  * BOTH directions over integral single-side expressions — the
  * `|a − b| ≤/< δ` spelling or the two-conjunct BETWEEN family
  * (`a ≤ b + δ && a ≥ b − δ`, `a − b ≤ δ && b − a ≤ δ`, strict forms
  * tightened by 1; asymmetric bounds bucket on the larger δ with the
  * originals as residual). Operands may be integral expressions or
  * raw TIMESTAMP columns with INTERVAL arithmetic (`ts ≤ ts2 +
  * INTERVAL δ && …`, `abs(ts − ts2) ≤ INTERVAL δ`) — timestamps
  * bucket on unix_micros with the interval's microsecond bound. Never
  * fires with a cross-side equality conjunct present (with
  * one, Spark already plans a hash join and the band is a cheap
  * residual). The rewritten join carries the bucket equality, so the
  * rule cannot re-fire on its own output.
  */
object BandJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private def isIntegral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def litLong(l: Literal): Option[Long] = l.value match {
    case i: java.lang.Integer => Some(i.longValue)
    case i: java.lang.Long => Some(i.longValue)
    case _ => None
  }

  private def goodOperand(e: Expression): Boolean =
    (isIntegral(e) || e.dataType == TimestampType) && e.deterministic

  /** Micros of a day-time interval literal (stored as a Long). */
  private def intervalMicros(l: Literal): Option[Long] = l.dataType match {
    case _: DayTimeIntervalType => l.value match {
      case i: java.lang.Long => Some(i.longValue)
      case _ => None
    }
    case _ => None
  }

  /** Directed bounds `x − y ≤ δ` extracted from one conjunct, in every
    * common spelling: `abs(x − y) ≤ δ` (both directions at once),
    * `x − y ≤ δ`, `x ≤ y + δ`, `x ≥ y − δ`, each also in the
    * literal-first and strict (`<`, integral ⇒ δ−1) forms.
    */
  private def bounds(c: Expression): Seq[(Expression, Expression, Long)] = {
    // normalize to (lhs ≤ rhs) pairs, strict inequalities tightened
    val le: Seq[(Expression, Expression, Long)] = c match {
      case LessThanOrEqual(a, b) => Seq((a, b, 0L))
      case LessThan(a, b) => Seq((a, b, -1L))
      case GreaterThanOrEqual(a, b) => Seq((b, a, 0L))
      case GreaterThan(a, b) => Seq((b, a, -1L))
      case _ => Seq.empty
    }
    le.flatMap { case (lhs, rhs, adj) =>
      (lhs, rhs) match {
        // abs(x − y) ≤ δ ⇒ both directions
        case (Abs(Subtract(x, y, _), _), l: Literal)
            if goodOperand(x) && goodOperand(y) =>
          litLong(l).toSeq.flatMap(d =>
            Seq((x, y, d + adj), (y, x, d + adj)))
        // x − y ≤ δ
        case (Subtract(x, y, _), l: Literal)
            if goodOperand(x) && goodOperand(y) =>
          litLong(l).toSeq.map(d => (x, y, d + adj))
        // x ≤ y + δ  /  x ≤ δ + y
        case (x, Add(y, l: Literal, _)) if goodOperand(x) && goodOperand(y) =>
          litLong(l).toSeq.map(d => (x, y, d + adj))
        case (x, Add(l: Literal, y, _)) if goodOperand(x) && goodOperand(y) =>
          litLong(l).toSeq.map(d => (x, y, d + adj))
        // x ≤ y − δ   (x − y ≤ −δ; negative bound, kept for max())
        case (x, Subtract(y, l: Literal, _))
            if goodOperand(x) && goodOperand(y) =>
          litLong(l).toSeq.map(d => (x, y, -d + adj))
        // y − δ ≤ x   (y − x ≤ δ)
        case (Subtract(y, l: Literal, _), x)
            if goodOperand(x) && goodOperand(y) =>
          litLong(l).toSeq.map(d => (y, x, d + adj))
        // y + δ ≤ x   (y − x ≤ −δ)
        case (Add(y, l: Literal, _), x)
            if goodOperand(x) && goodOperand(y) =>
          litLong(l).toSeq.map(d => (y, x, -d + adj))
        case (Add(l: Literal, y, _), x)
            if goodOperand(x) && goodOperand(y) =>
          litLong(l).toSeq.map(d => (y, x, -d + adj))
        // timestamp spellings — bounds in MICROS (buckets use
        // unix_micros, so the unit lines up):
        // |ts_x − ts_y| ≤ INTERVAL δ
        case (Abs(SubtractTimestamps(x, y, _, _), _), l: Literal)
            if goodOperand(x) && goodOperand(y) =>
          intervalMicros(l).toSeq.flatMap(d =>
            Seq((x, y, d + adj), (y, x, d + adj)))
        // ts_x ≤ ts_y + INTERVAL δ (a negative δ covers the `− INTERVAL`
        // spelling — the parser folds it into an interval literal)
        case (x, TimestampAddInterval(y, l: Literal, _))
            if goodOperand(x) && goodOperand(y) =>
          intervalMicros(l).toSeq.map(d => (x, y, d + adj))
        // ts_y + INTERVAL δ ≤ ts_x  (y − x ≤ −δ)
        case (TimestampAddInterval(y, l: Literal, _), x)
            if goodOperand(x) && goodOperand(y) =>
          intervalMicros(l).toSeq.map(d => (y, x, -d + adj))
        case _ => Seq.empty
      }
    }
  }

  /** (leftSideExpr, rightSideExpr, δ) once the conjuncts contain BOTH
    * directed bounds `a − b ≤ δ₁` and `b − a ≤ δ₂` for the same
    * cross-side pair — δ = max(δ₁, δ₂) covers the asymmetric case and
    * the original conjuncts stay as the residual.
    */
  private def bandFromConjuncts(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Long)] = {
    val all = conjuncts.flatMap(bounds)
    def side(a: Expression, p: LogicalPlan): Boolean =
      a.references.nonEmpty && a.references.subsetOf(p.outputSet)
    // orient every bound as (leftExpr, rightExpr, δ on left−right)
    val fwd = all.collect {
      case (x, y, d) if side(x, left) && side(y, right) => (x, y, d) }
    val bwd = all.collect {
      case (x, y, d) if side(x, right) && side(y, left) => (y, x, d) }
    (for {
      (ls, rs, d1) <- fwd.iterator
      (ls2, rs2, d2) <- bwd.iterator
      if ls.semanticEquals(ls2) && rs.semanticEquals(rs2)
      delta = math.max(d1, d2)
      if delta > 0
    } yield (ls, rs, delta)).nextOption()
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
    * Timestamps bucket on their microsecond count — the unit the
    * interval bounds carry.
    */
  private def bucket(e: Expression, delta: Long): Expression = {
    val d = Literal(delta)
    val el = e.dataType match {
      case TimestampType => UnixMicros(e)
      case LongType => e
      case _ => Cast(e, LongType)
    }
    IntegralDivide(Subtract(el, Pmod(el, d)), d)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, jt, Some(cond), hint)
        if (jt == Inner || jt == LeftOuter) &&
          left.resolved && right.resolved => {
      val conjuncts = splitConjunctivePredicates(cond)
      if (hasCrossEquality(conjuncts, left, right)) j
      else bandFromConjuncts(conjuncts, left, right).toList match {
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
