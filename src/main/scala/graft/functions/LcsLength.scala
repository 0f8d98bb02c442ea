package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Longest-common-subsequence length over two token arrays — the core of
  * ROUGE-L (Lin 2004) and of order-aware near-dup scoring. NOT expressible
  * with built-ins: Spark's `levenshtein` is char-level and permits
  * substitutions, and the indel-only identity `LCS = (|a|+|b|−d_indel)/2`
  * needs an edit distance WITHOUT substitution, which no built-in computes.
  *
  * Native Catalyst `Expression` in the [[RollingHash]] mold: per-row
  * two-row DP (O(|a|·|b|) time, O(|b|) space), zero allocation beyond the
  * two int rows, and `doGenCode` keeps the surrounding stage in
  * whole-stage codegen (the generated code calls the same static method
  * the interpreted path uses, so the three paths — interpreted, codegen,
  * reference recursion in the spec — are one implementation).
  *
  * Null semantics: a null ARRAY on either side yields null (Binary
  * nullSafeEval); a null ELEMENT equals nothing, including another null
  * (it can never extend a common subsequence) — the conservative choice,
  * irrelevant to `split`-produced arrays which are never null-elemented.
  */
case class LcsLength(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lcs_length expects (ARRAY<STRING>, ARRAY<STRING>), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    LcsLength.lcs(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.LcsLength.lcs($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): LcsLength = copy(left = newLeft, right = newRight)
}

object LcsLength {
  /** Two-row LCS DP; shared by interpreted eval and generated code. */
  def lcs(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 || m == 0) return 0
    val bs = new Array[UTF8String](m)
    var j = 0
    while (j < m) { bs(j) = b.getUTF8String(j); j += 1 }
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 0
    while (i < n) {
      val ai = a.getUTF8String(i)
      j = 0
      while (j < m) {
        val eq = ai != null && bs(j) != null && ai.equals(bs(j))
        cur(j + 1) =
          if (eq) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }

  /** Column API (Spark 4 hides Column↔Expression behind private[sql];
    * bridged like [[RollingHash.rolling_hash]]).
    */
  def lcs_length(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.Bridge
    Bridge.column(LcsLength(Bridge.expression(a), Bridge.expression(b)))
  }
}
