package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** All random-hyperplane LSH signatures of a vector in ONE native
  * Catalyst expression: `hyperplane_sigs(v, tables, bits, dims)` returns
  * `array<int>` of length `tables`, element `t` being the `bits`-wide
  * sign signature Σ_b (dot(v, plane(t,b)) > 0) << b — bit-identical to
  * folding [[graft.pipeline.Similarity.lshSignature]] columns (same
  * plane family, same ascending-dimension dot order).
  *
  * Why an expression and not composed columns: at adaptive widths the
  * composed form is `tables × bits` separate [[ArrayDot]]s against
  * 64-literal plane arrays — at 16×8 that is ~128 unrolled dots whose
  * generated code falls out of whole-stage codegen (measured 11 s to
  * sign 20k×16 rows at sf1, recomputed once per `cappedPairs` consumer).
  * Here the planes are one flat `double[]` baked into the expression
  * (deterministic [[graft.pipeline.Similarity.planeComponent]] mixing —
  * nothing random at runtime, the plan stays retry-stable) and the
  * generated code is three small loops: sub-second at the same scale.
  *
  * Null contract mirrors [[ArrayDot]]: null input, a null element, or a
  * length ≠ `dims` (corrupt input) nulls the result rather than
  * silently mis-signing.
  */
case class HyperplaneSigs(child: Expression, tables: Int, bits: Int,
    dims: Int) extends UnaryExpression {
  require(tables > 0 && bits > 0 && bits <= 30 && dims > 0,
    s"hyperplane_sigs: bad shape tables=$tables bits=$bits dims=$dims")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sigs expects array<double>, got ${t.sql}")
  }

  override def nullable: Boolean = true

  // [t][b][i] flattened; identical values to the literal planes the
  // column form builds (same planeComponent calls, same order)
  @transient private lazy val planes: Array[Double] = {
    val p = new Array[Double](tables * bits * dims)
    var t = 0
    while (t < tables) {
      var b = 0
      while (b < bits) {
        var i = 0
        while (i < dims) {
          p((t * bits + b) * dims + i) =
            graft.pipeline.Similarity.planeComponent(t, b, i)
          i += 1
        }
        b += 1
      }
      t += 1
    }
    p
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dims) return null
    var i = 0
    while (i < dims) {
      if (v.isNullAt(i)) return null
      i += 1
    }
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var sig = 0
      var b = 0
      while (b < bits) {
        val base = (t * bits + b) * dims
        var s = 0.0
        var j = 0
        while (j < dims) {
          s += v.getDouble(j) * planes(base + j)
          j += 1
        }
        if (s > 0) sig |= (1 << b)
        b += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val sig = ctx.freshName("sig")
      val base = ctx.freshName("base")
      val out = ctx.freshName("out")
      val ok = ctx.freshName("ok")
      s"""
         |boolean $ok = $v.numElements() == $dims;
         |for (int $i = 0; $ok && $i < $dims; $i++) {
         |  if ($v.isNullAt($i)) $ok = false;
         |}
         |if (!$ok) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $out = new int[$tables];
         |  for (int $t = 0; $t < $tables; $t++) {
         |    int $sig = 0;
         |    for (int $b = 0; $b < $bits; $b++) {
         |      int $base = ($t * $bits + $b) * $dims;
         |      double $s = 0.0;
         |      for (int $j = 0; $j < $dims; $j++) {
         |        $s += $v.getDouble($j) * $planesRef[$base + $j];
         |      }
         |      if ($s > 0) $sig |= (1 << $b);
         |    }
         |    $out[$t] = $sig;
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneSigs = copy(child = newChild)
}

object HyperplaneSigs {
  /** Column helper: per-table LSH signatures of a double-array column. */
  def hyperplane_sigs(v: Column, tables: Int, bits: Int,
      dims: Int): Column = {
    import org.apache.spark.sql.graftshim.Bridge
    Bridge.column(HyperplaneSigs(Bridge.expression(v), tables, bits, dims))
  }
}
