package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join,
  LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DayTimeIntervalType, Decimal,
  DecimalType, DoubleType, FloatType, LongType, TimestampType}

/** Optimizer rule that rescues naive band joins: a user who writes
  *
  *   left.join(right, abs(l("ts") − r("ts")) <= lit(δ))
  *
  * gets a BroadcastNestedLoopJoin from Spark — the full pair product,
  * a cluster-killer at any real size. [[graft.operators.BandJoin]]
  * exists as the explicit scale-safe form; this rule teaches Catalyst
  * to apply the SAME δ-bucket rewrite automatically, so the naive
  * spelling plans like the explicit one: quantize both sides into
  * bucket keys, replicate ONE side into its own bucket and both
  * neighbors (a qualifying pair's buckets differ by ≤ 1, and EXACTLY
  * one replica carries the other row's bucket — no duplicates,
  * outer-safe), join on bucket equality with the original band
  * predicate as residual. Inner/left_outer replicate the right side
  * (unmatched LEFTS must survive exactly once, and the left side stays
  * un-replicated); right_outer is the mirror — the LEFT side
  * replicates, so unmatched rights survive exactly once.
  *
  * Fires only when it is the difference between a product and a hash
  * join: joins whose condition bounds `a − b` in BOTH directions over
  * single-side expressions — the `|a − b| ≤/< δ` spelling or the
  * two-conjunct BETWEEN family (`a ≤ b + δ && a ≥ b − δ`,
  * `a − b ≤ δ && b − a ≤ δ`; asymmetric bounds bucket on the larger δ
  * with the originals as residual). Operand families:
  *
  *  - BIGINT expressions (strict bounds tighten by 1): buckets are
  *    exact floor division. ASSUMES non-wrapping arithmetic in the
  *    user's conjuncts — true for any real quantity (an |a − b| that
  *    overflows BIGINT needs operands ≥ 2⁶² apart). INT operands are
  *    deliberately EXCLUDED: with ANSI off, a pair at Int extremes can
  *    wrap both conjuncts to "true" (x = −2³¹, y = 2³¹−1 gives
  *    x − y = 1) and the un-rewritten join emits it while the bucket
  *    equality would not — an optimizer must never change results, so
  *    Int bands are left to the user to cast to BIGINT.
  *  - raw TIMESTAMP columns with INTERVAL arithmetic (`ts ≤ ts2 +
  *    INTERVAL δ && …`, `abs(ts − ts2) ≤ INTERVAL δ`) — bucket on
  *    unix_micros with the interval's microsecond bound.
  *  - DOUBLE / FLOAT / DECIMAL expressions: buckets are
  *    floor(x / 2δ) with ±1 replicas. The doubled width makes IEEE
  *    rounding harmless: true quotients of a qualifying pair differ by
  *    ≤ 0.5, and two correctly-rounded divisions perturb that by ulps,
  *    never past the 1.0 that two buckets apart would need — PROVIDED
  *    |x| / 2δ < 2⁵¹ (quotient ulp < 0.5). Beyond that magnitude the
  *    quotient cannot resolve δ at all and a boundary pair could land
  *    2 buckets apart, so the bucket expression carries a per-row
  *    FAIL-LOUD guard at 2⁵⁰ (see [[bucketD]]) — extreme-magnitude
  *    data raises a runtime error naming the fix instead of silently
  *    losing pairs, and [[ContinuousEnabledKey]] turns the whole
  *    continuous path off for users who prefer the un-rewritten plan
  *    (decimals ride the same doubled-width path through a double
  *    cast; their residual predicate stays exact decimal arithmetic).
  *    Strict bounds keep δ for bucketing (a sound superset — the
  *    residual enforces strictness).
  *
  * Never fires with a cross-side equality conjunct present (with one,
  * Spark already plans a hash join and the band is a cheap residual).
  * The rewritten join carries the bucket equality, so the rule cannot
  * re-fire on its own output.
  */
object BandJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private def litLong(l: Literal): Option[Long] = l.value match {
    case i: java.lang.Integer => Some(i.longValue)
    case i: java.lang.Long => Some(i.longValue)
    case _ => None
  }

  private def litDouble(l: Literal): Option[Double] = l.value match {
    case d: java.lang.Double => Some(d.doubleValue)
    case f: java.lang.Float => Some(f.doubleValue)
    case d: Decimal => Some(d.toDouble)
    case _ => litLong(l).map(_.toDouble)
  }

  private def goodOperand(e: Expression): Boolean =
    (e.dataType == LongType || e.dataType == TimestampType) &&
      e.deterministic

  private def goodOperandD(e: Expression): Boolean =
    (e.dataType == DoubleType || e.dataType == FloatType ||
      e.dataType.isInstanceOf[DecimalType]) && e.deterministic

  /** Decimal comparisons arrive wrapped in overflow checks
    * (`abs(x − y)` over decimals is Abs(CheckOverflow(Subtract(…)))) —
    * strip the bookkeeping so the structural patterns below see the
    * arithmetic.
    */
  private def stripDecimal(e: Expression): Expression = e match {
    case CheckOverflow(c, _, _) => stripDecimal(c)
    case _ => e
  }

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

  /** The continuous family's directed bounds — same spellings over
    * DOUBLE / FLOAT / DECIMAL operands, δ as a double. Strict forms
    * keep δ (the residual enforces strictness; tightening has no
    * integer grid to tighten to).
    */
  private def boundsD(c: Expression)
      : Seq[(Expression, Expression, Double)] = {
    val le: Seq[(Expression, Expression)] = c match {
      case LessThanOrEqual(a, b) => Seq((a, b))
      case LessThan(a, b) => Seq((a, b))
      case GreaterThanOrEqual(a, b) => Seq((b, a))
      case GreaterThan(a, b) => Seq((b, a))
      case _ => Seq.empty
    }
    le.flatMap { case (lhs0, rhs0) =>
      (stripDecimal(lhs0), stripDecimal(rhs0)) match {
        case (Abs(sub, _), l: Literal) => stripDecimal(sub) match {
          case Subtract(x, y, _) if goodOperandD(x) && goodOperandD(y) =>
            litDouble(l).toSeq.flatMap(d => Seq((x, y, d), (y, x, d)))
          case _ => Seq.empty
        }
        case (Subtract(x, y, _), l: Literal)
            if goodOperandD(x) && goodOperandD(y) =>
          litDouble(l).toSeq.map(d => (x, y, d))
        case (x, Add(y, l: Literal, _))
            if goodOperandD(x) && goodOperandD(y) =>
          litDouble(l).toSeq.map(d => (x, y, d))
        case (x, Add(l: Literal, y, _))
            if goodOperandD(x) && goodOperandD(y) =>
          litDouble(l).toSeq.map(d => (x, y, d))
        case (x, Subtract(y, l: Literal, _))
            if goodOperandD(x) && goodOperandD(y) =>
          litDouble(l).toSeq.map(d => (x, y, -d))
        case (Subtract(y, l: Literal, _), x)
            if goodOperandD(x) && goodOperandD(y) =>
          litDouble(l).toSeq.map(d => (y, x, d))
        case (Add(y, l: Literal, _), x)
            if goodOperandD(x) && goodOperandD(y) =>
          litDouble(l).toSeq.map(d => (y, x, -d))
        case (Add(l: Literal, y, _), x)
            if goodOperandD(x) && goodOperandD(y) =>
          litDouble(l).toSeq.map(d => (y, x, -d))
        case _ => Seq.empty
      }
    }
  }

  private def sided[A](all: Seq[(Expression, Expression, A)],
      left: LogicalPlan, right: LogicalPlan)
      : (Seq[(Expression, Expression, A)],
         Seq[(Expression, Expression, A)]) = {
    def side(a: Expression, p: LogicalPlan): Boolean =
      a.references.nonEmpty && a.references.subsetOf(p.outputSet)
    (all.collect {
      case (x, y, d) if side(x, left) && side(y, right) => (x, y, d) },
     all.collect {
      case (x, y, d) if side(x, right) && side(y, left) => (y, x, d) })
  }

  /** (leftSideExpr, rightSideExpr, δ) once the conjuncts contain BOTH
    * directed bounds `a − b ≤ δ₁` and `b − a ≤ δ₂` for the same
    * cross-side pair — δ = max(δ₁, δ₂) covers the asymmetric case and
    * the original conjuncts stay as the residual.
    */
  private def bandFromConjuncts(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Long)] = {
    val (fwd, bwd) = sided(conjuncts.flatMap(bounds), left, right)
    (for {
      (ls, rs, d1) <- fwd.iterator
      (ls2, rs2, d2) <- bwd.iterator
      if ls.semanticEquals(ls2) && rs.semanticEquals(rs2)
      delta = math.max(d1, d2)
      if delta > 0
    } yield (ls, rs, delta)).nextOption()
  }

  private def bandFromConjunctsD(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Double)] = {
    val (fwd, bwd) = sided(conjuncts.flatMap(boundsD), left, right)
    (for {
      (ls, rs, d1) <- fwd.iterator
      (ls2, rs2, d2) <- bwd.iterator
      if ls.semanticEquals(ls2) && rs.semanticEquals(rs2)
      delta = math.max(d1, d2)
      if delta > 0.0 && java.lang.Double.isFinite(delta)
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
      case _ => e
    }
    IntegralDivide(Subtract(el, Pmod(el, d)), d)
  }

  /** Conf gate for the continuous (DOUBLE/FLOAT/DECIMAL) path only —
    * the exact BIGINT/timestamp path is always on. Default true: the
    * magnitude soundness bound is enforced per ROW by [[bucketD]]'s
    * fail-loud guard, so extreme data errors instead of silently
    * dropping pairs; the flag exists for users who would rather keep
    * the (correct, product-shaped) nested-loop plan than see the
    * runtime error.
    */
  val ContinuousEnabledKey = "spark.graft.bandJoinRewrite.continuousEnabled"

  /** Continuous bucket: floor(x / 2δ) — the doubled width absorbs IEEE
    * division rounding (see class doc), Floor on DOUBLE yields BIGINT.
    *
    * The proof needs the quotient ulp < 0.5, i.e. |x| / 2δ < 2⁵¹.
    * There is no static check on data magnitude, so the bucket carries
    * a per-row GUARD at the stricter 2⁵⁰ (one binade of headroom so a
    * qualifying partner of a barely-legal row is itself still inside
    * the proof): any FINITE row past it raises a runtime error naming
    * the fix, rather than letting an optimizer rewrite silently drop
    * qualifying pairs. NULL operands take the bucket branch (bucket of
    * NULL is NULL, same as before the guard).
    *
    * Non-finite values are well-defined under the un-rewritten join,
    * so the guard must NOT turn them into errors — each non-finite
    * class gets its own SENTINEL bucket and the original residual
    * decides, exactly as the naive plan would:
    *  - NaN pairs with NaN under the BETWEEN spellings (Spark orders
    *    NaN = NaN and largest, so `NaN ≤ NaN + δ` holds) but not under
    *    the abs spelling (`NaN ≤ δ` is false). A NULL bucket would
    *    silently LOSE the BETWEEN-spelling NaN–NaN pairs, so NaN rows
    *    share a sentinel bucket and the residual keeps or drops the
    *    pair per spelling.
    *  - ±Inf pairs exactly with the same infinity under BETWEEN
    *    (`inf ≤ inf + δ`; the abs residual is `NaN ≤ δ` → drop) →
    *    per-infinity sentinels, residual decides.
    * Sentinels sit ≥2 inside the Long extremes so the ±1 replica
    * arithmetic cannot overflow (ANSI-safe), and no finite bucket can
    * collide: the guard bounds finite |buckets| under 2⁵⁰. A replica
    * of one sentinel landing on another (NaN's +1 vs −Inf's −1, etc.)
    * is impossible by spacing, and would be residual-rejected anyway.
    */
  private def bucketD(e: Expression, delta: Double): Expression = {
    val x = Cast(e, DoubleType)
    val width = 2.0d * delta
    // Double.PositiveInfinity when width·2⁵⁰ overflows — then every
    // finite row passes, which is right: a huge δ means tiny quotients
    val limit = width * 1125899906842624.0d // 2^50
    val guard = Or(IsNull(x),
      LessThan(Abs(x, failOnError = false), Literal(limit)))
    val err = Cast(new RaiseError(Literal(
      s"BandJoinRewrite: finite |operand| exceeds $limit = 2delta*2^50, " +
        "beyond which delta-bucketing cannot resolve the band; cast " +
        s"the operands to BIGINT or set $ContinuousEnabledKey=false")),
      LongType)
    CaseWhen(Seq(
      (IsNaN(x), Literal(Long.MaxValue - 5L)),
      (EqualTo(x, Literal(Double.PositiveInfinity)),
        Literal(Long.MaxValue - 2L)),
      (EqualTo(x, Literal(Double.NegativeInfinity)),
        Literal(Long.MinValue + 2L))),
      If(guard, Floor(Divide(x, Literal(width))), err))
  }

  /** The δ-bucket rewrite with the replicated side chosen by join
    * type: the side whose unmatched rows must survive an outer join
    * exactly once is NEVER the replicated one.
    */
  private def rewrite(j: Join, bucketOf: Expression => Expression,
      ls: Expression, rs: Expression): LogicalPlan = {
    val Join(left, right, jt, Some(cond), hint) = j: @unchecked
    val replicateRight = jt != RightOuter
    val (keepPlan, keepExpr, repPlan, repExpr) =
      if (replicateRight) (left, ls, right, rs)
      else (right, rs, left, ls)
    val kb = Alias(bucketOf(keepExpr), "__kband")()
    val keepSide = Project(keepPlan.output :+ kb, keepPlan)
    val rb0 = Alias(bucketOf(repExpr), "__rband0")()
    val repB = Project(repPlan.output :+ rb0, repPlan)
    val rbAttr = AttributeReference("__rband", LongType,
      nullable = true)()
    val gen = Generate(
      Explode(CreateArray(Seq(
        Subtract(rb0.toAttribute, Literal(1L)),
        rb0.toAttribute,
        Add(rb0.toAttribute, Literal(1L))))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(rbAttr), child = repB)
    val newCond = And(EqualTo(kb.toAttribute, rbAttr), cond)
    val joined =
      if (replicateRight) Join(keepSide, gen, jt, Some(newCond), hint)
      else Join(gen, keepSide, jt, Some(newCond), hint)
    Project(j.output, joined)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, jt, Some(cond), _)
        if (jt == Inner || jt == LeftOuter || jt == RightOuter) &&
          left.resolved && right.resolved => {
      val conjuncts = splitConjunctivePredicates(cond)
      if (hasCrossEquality(conjuncts, left, right)) j
      else bandFromConjuncts(conjuncts, left, right) match {
        case Some((ls, rs, delta)) =>
          rewrite(j, bucket(_, delta), ls, rs)
        case None if conf.getConfString(ContinuousEnabledKey, "true")
            .toBoolean =>
          bandFromConjunctsD(conjuncts, left, right) match {
            case Some((ls, rs, delta)) =>
              rewrite(j, bucketD(_, delta), ls, rs)
            case None => j
          }
        case None => j
      }
    }
  }
}
