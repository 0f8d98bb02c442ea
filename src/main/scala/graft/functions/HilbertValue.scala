package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of a 2-D cell — the second space-filling curve
  * next to [[graft.sources.ZOrderLayout]]'s Morton interleave, and the
  * one with strictly better locality: consecutive curve positions are
  * ALWAYS grid-adjacent (Manhattan distance 1), so consecutive file
  * ranges tile the key space in compact blobs with no Z-shaped jumps —
  * measurably tighter per-file min/max rectangles at the same file
  * count (the property HilbertSpec asserts head-to-head against
  * z-order; the reason Delta/Iceberg grew `OPTIMIZE ... HILBERT`
  * variants next to ZORDER).
  *
  * The xy→d map is the classic iterated quadrant-rotation algorithm
  * (Hamilton's compact form): per level, the quadrant bit pair decides
  * which quarter of the curve the cell falls in, then the frame
  * reflects/transposes so the next level sees a canonically-oriented
  * sub-curve. Pure integer compares/adds on longs — no lookup tables,
  * no state across rows — implemented as a native Catalyst expression
  * WITH `doGenCode` (the generated Java runs the loop in place, the
  * stage stays fused), and re-derivable in ANSI SQL as one unrolled
  * CTE per level generated from the same constants
  * ([[graft.sources.HilbertLayout.hvalueCtes]]), so the oracle and the
  * engine cannot disagree about the curve.
  *
  * Inputs clamp to the low `bits` bits (callers range-rank or bucket
  * wider domains first); with bits ≤ 31 every intermediate and the
  * final d < 4^bits stay positive signed longs in any engine.
  */
case class HilbertValue(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits=$bits out of [1, 31]")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hilbert_value expects (BIGINT, BIGINT), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertValue.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c1, c2) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      val mask = (1L << bits) - 1L
      s"""
         |long $x = $c1 & ${mask}L;
         |long $y = $c2 & ${mask}L;
         |long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0L; $s >>= 1) {
         |  long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) {
         |      $x = $s - 1L - $x;
         |      $y = $s - 1L - $y;
         |    }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HilbertValue =
    copy(left = newLeft, right = newRight)
}

object HilbertValue {
  /** Reference implementation — interpreted eval, codegen, the spec's
    * independent re-derivation, and the generated oracle SQL must all
    * agree with this.
    */
  def xy2d(a: Long, b: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1L
    var x = a & mask
    var y = b & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Column API (Bridge — Spark 4 hides Column↔Expression conversion). */
  def hilbert_value(a: Column, b: Column, bits: Int): Column = {
    import org.apache.spark.sql.graftshim.Bridge
    Bridge.column(HilbertValue(
      Bridge.expression(a.cast("long")),
      Bridge.expression(b.cast("long")), bits))
  }
}
