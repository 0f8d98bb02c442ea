package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Unit-normalization of an `array<double>` column as a native codegen
  * expression: one pass for the norm, one for the scale.
  *
  * The composable form (`transform(a, x => x / sqrt(array_dot(a, a)))`)
  * re-evaluates the norm — a full dot product — for EVERY element, because
  * higher-order functions are CodegenFallback and nothing eliminates the
  * loop-invariant subexpression: an O(d²) normalize per row, 64× waste at
  * d=64. This expression is the linear-cost pass every similarity operator
  * normalizes with. A zero vector normalizes to itself (no NaN fan-out);
  * null stays null.
  */
case class ArrayNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"array_normalize expects array<double>, got ${t.sql}")
  }

  // a null ELEMENT nulls the whole result — a vector with a missing
  // dimension has no meaningful norm; getDouble on a null slot would
  // silently read it as 0/garbage. Hence nullable even for non-null input.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getDouble(i); s += v * v; i += 1
    }
    val inv = if (s > 0.0) 1.0 / math.sqrt(s) else 1.0
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = x.getDouble(i) * inv; i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val inv = ctx.freshName("inv")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double v = $a.getDouble($i);
         |  $s += v * v;
         |}
         |if (!${ev.isNull}) {
         |  double $inv = $s > 0.0 ? 1.0 / java.lang.Math.sqrt($s) : 1.0;
         |  double[] $out = new double[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = $a.getDouble($i) * $inv;
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): ArrayNormalize =
    copy(child = c)
}

object ArrayNormalize {
  def array_normalize(a: Column): Column = {
    import org.apache.spark.sql.graftshim.Bridge
    Bridge.column(ArrayNormalize(Bridge.expression(a)))
  }
}
