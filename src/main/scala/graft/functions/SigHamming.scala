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
  * deflate the distance instead of surfacing it.
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
}
