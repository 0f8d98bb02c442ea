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

  /** Column helper: home signature + `probes` multi-probe variants per
    * table — see [[HyperplaneProbeSigs]].
    */
  def hyperplane_probe_sigs(v: Column, tables: Int, bits: Int,
      dims: Int, probes: Int): Column = {
    import org.apache.spark.sql.graftshim.Bridge
    Bridge.column(HyperplaneProbeSigs(Bridge.expression(v), tables, bits,
      dims, probes))
  }
}

/** Multi-probe LSH signatures (Lv et al., VLDB 2007, applied to the
  * sign-bit family): per table, the home signature PLUS the `probes`
  * bucket keys reachable by flipping one low-margin sign bit each — the
  * bits whose |dot(v, plane)| is smallest, i.e. the bits most likely to
  * disagree for a true near neighbor. Probing L extra buckets per table
  * buys roughly the recall of L extra tables at ONE table's index
  * storage — the lever that keeps recall alive once
  * [[graft.pipeline.Similarity.lshParams]]'s `maxTables` cap engages at
  * large n (the r14 verdict's modeled 2%-recall cliff at n ≳ 8M).
  *
  * Layout: `array<int>` of length `tables × (1 + probes)`; element
  * `t*(1+probes)` is table t's home signature (bit-identical to
  * [[HyperplaneSigs]] — same planes, same ascending-dimension dot
  * order), elements `t*(1+probes)+1+p` are `sig XOR (1 << b_p)` where
  * `b_p` is the p-th smallest bit by (|dot|, bit index) — the
  * ascending-index tie break both engines reproduce (the DuckDB twin
  * ranks `ORDER BY abs(d), b`). `probes = 0` degenerates to exactly
  * [[HyperplaneSigs]]' output, so one code path serves both regimes.
  *
  * Null contract: identical to [[HyperplaneSigs]].
  */
case class HyperplaneProbeSigs(child: Expression, tables: Int, bits: Int,
    dims: Int, probes: Int) extends UnaryExpression {
  require(tables > 0 && bits > 0 && bits <= 30 && dims > 0,
    s"hyperplane_probe_sigs: bad shape tables=$tables bits=$bits dims=$dims")
  require(probes >= 0 && probes < bits,
    s"hyperplane_probe_sigs: probes=$probes must be in [0, bits=$bits)")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_probe_sigs expects array<double>, got ${t.sql}")
  }

  override def nullable: Boolean = true

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
    val step = probes + 1
    val out = new Array[Int](tables * step)
    val d = new Array[Double](bits)
    val used = new Array[Boolean](bits)
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
        d(b) = s
        used(b) = false
        if (s > 0) sig |= (1 << b)
        b += 1
      }
      out(t * step) = sig
      var p = 0
      while (p < probes) {
        // p-th smallest |dot|, ties to the smaller bit index (the
        // strict < under an ascending scan — matches ORDER BY abs(d), b)
        var best = -1
        var bb = 0
        while (bb < bits) {
          if (!used(bb) &&
              (best < 0 || math.abs(d(bb)) < math.abs(d(best)))) best = bb
          bb += 1
        }
        used(best) = true
        out(t * step + 1 + p) = sig ^ (1 << best)
        p += 1
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    val step = probes + 1
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
      val d = ctx.freshName("d")
      val used = ctx.freshName("used")
      val p = ctx.freshName("p")
      val bb = ctx.freshName("bb")
      val best = ctx.freshName("best")
      s"""
         |boolean $ok = $v.numElements() == $dims;
         |for (int $i = 0; $ok && $i < $dims; $i++) {
         |  if ($v.isNullAt($i)) $ok = false;
         |}
         |if (!$ok) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $out = new int[${tables * step}];
         |  double[] $d = new double[$bits];
         |  boolean[] $used = new boolean[$bits];
         |  for (int $t = 0; $t < $tables; $t++) {
         |    int $sig = 0;
         |    for (int $b = 0; $b < $bits; $b++) {
         |      int $base = ($t * $bits + $b) * $dims;
         |      double $s = 0.0;
         |      for (int $j = 0; $j < $dims; $j++) {
         |        $s += $v.getDouble($j) * $planesRef[$base + $j];
         |      }
         |      $d[$b] = $s;
         |      $used[$b] = false;
         |      if ($s > 0) $sig |= (1 << $b);
         |    }
         |    $out[$t * $step] = $sig;
         |    for (int $p = 0; $p < $probes; $p++) {
         |      int $best = -1;
         |      for (int $bb = 0; $bb < $bits; $bb++) {
         |        if (!$used[$bb] && ($best < 0 ||
         |            Math.abs($d[$bb]) < Math.abs($d[$best]))) $best = $bb;
         |      }
         |      $used[$best] = true;
         |      $out[$t * $step + 1 + $p] = $sig ^ (1 << $best);
         |    }
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneProbeSigs = copy(child = newChild)
}
