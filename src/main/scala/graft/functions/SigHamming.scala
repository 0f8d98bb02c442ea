package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Hamming distance between two packed LSH signature vectors
  * (`array<int>`, one element per table as emitted by
  * [[HyperplaneSigs]]): Σᵢ popcount(a[i] XOR b[i]).
  *
  * This is the workhorse of the sketch-screened verify cascade: a
  * candidate pair's stored sign bits already estimate its cosine
  * (Charikar, STOC 2002 — P[bit agrees] = 1 − θ/π), so a pair whose
  * agreement falls a calibrated margin below the design-point mean can
  * be rejected BEFORE the 64-double vector fetch + exact dot, touching
  * 2×64 B of signature instead of 2×512 B of vector per candidate.
  * Deterministic given the plane family, hence replayable in the DuckDB
  * twins (per-table `bit_count(xor(...))` sums).
  *
  * Native expression for the same reason as [[ArrayDot]]: the
  * composable `aggregate(zip_with(...))` form allocates an intermediate
  * array per row and evaluates lambdas per element — ruinous on a
  * candidate mass that exists precisely to be screened cheaply. This
  * loops over the two `ArrayData` buffers with primitive reads, fused
  * into the surrounding generated stage.
  *
  * Null contract (the [[ArrayDot]] rules): null if either side is null,
  * if any element is null, or if the lengths differ — signatures of
  * different table counts are corrupt input, and truncating would
  * deflate the distance instead of surfacing it. Because every call
  * site uses the distance as a FILTER (where a null predicate silently
  * evaluates to false), screens must go through [[SigHamming.screen_pass]],
  * which coalesces a null distance to PASS: a missing or corrupt
  * signature falls through to the exact verify (costing one vector
  * fetch) instead of silently dropping the candidate (invisible recall
  * loss) — the r15 ADVICE contract, and the migration path for index
  * partitions written before signatures were stored.
  */
case class SigHamming(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sig_hamming expects (array<int>, array<int>), got " +
          s"(${l.sql}, ${r.sql})")
    }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var h = 0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      h += Integer.bitCount(x.getInt(i) ^ y.getInt(i))
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      s"""
         |int $n = $a.numElements();
         |int $h = 0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $h += Integer.bitCount($a.getInt($i) ^ $b.getInt($i));
         |  }
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SigHamming = copy(left = newLeft, right = newRight)
}

object SigHamming {
  /** Column helper. */
  def sig_hamming(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.Bridge
    Bridge.column(SigHamming(Bridge.expression(a), Bridge.expression(b)))
  }

  /** The SCREEN predicate every verify cascade must use (never a bare
    * `sig_hamming(..) <= budget` filter): true when the pair's stored
    * signature distance fits the budget, AND true when the distance is
    * NULL (side/element null or width mismatch — an unsigned legacy
    * index row or corrupt signature), so such pairs fall through to the
    * exact verify instead of being silently screened out. The screen is
    * an OPTIMIZATION; nulls must degrade to the unscreened path's cost,
    * not to recall loss.
    */
  def screen_pass(a: Column, b: Column, maxHamming: Int): Column =
    org.apache.spark.sql.functions.coalesce(
      sig_hamming(a, b) <= maxHamming,
      org.apache.spark.sql.functions.lit(true))
}
