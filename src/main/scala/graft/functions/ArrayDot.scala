package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product of two `array<double>` columns as a native Catalyst
  * expression with whole-stage codegen.
  *
  * The composable form (`aggregate(zip_with(a, b, _*_), 0d, _+_)`)
  * allocates an intermediate array per row and evaluates a lambda per
  * element; on an all-pairs similarity join that dominated the benchmark
  * (58 s of a 124 s total at sf0.1). This expression loops over the two
  * `ArrayData` buffers with primitive reads — no allocation, stays fused
  * in the generated stage. Null if either side is null, if any element is
  * null, or if the LENGTHS differ — a 63-dim row dotted against 64-dim
  * vectors is corrupt input, and silently truncating to the shorter
  * length would deflate similarity scores instead of surfacing it.
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"array_dot expects (array<double>, array<double>), got " +
          s"(${l.sql}, ${r.sql})")
    }

  // a null ELEMENT nulls the result (there is no meaningful dot product
  // with a missing dimension); reading it via getDouble would silently
  // treat it as garbage/0. Hence nullable even for non-null inputs.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ArrayDot = copy(left = newLeft, right = newRight)
}

object ArrayDot {
  def array_dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.Bridge
    Bridge.column(ArrayDot(Bridge.expression(a), Bridge.expression(b)))
  }
}
