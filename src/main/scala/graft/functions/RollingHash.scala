package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling hash over a string's UTF-8 bytes:
  * `h := h * 31 + byte` with natural Long wraparound — the classic
  * content-fingerprint primitive (document fingerprinting, north star).
  *
  * Implemented as a native Catalyst `Expression` WITH `doGenCode` so it
  * participates in whole-stage codegen: the generated Java loops over the
  * UTF8String bytes in place — no UDF boxing, no per-row allocation, and
  * the surrounding filter/project stage stays fused (the preference order
  * of SURVEY §7: built-in > Expression > UDF).
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash expects STRING, got ${child.dataType.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    RollingHash.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * 31L + (long) $bytes[$i];
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : RollingHash = copy(child = newChild)
}

object RollingHash {
  /** Reference implementation — the spec checks interpreted eval, codegen,
    * and this agree.
    */
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + bytes(i); i += 1 }
    h
  }

  def hashString(s: String): Long =
    hashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Column API (bridged through [[org.apache.spark.sql.graftshim.Bridge]]
    * — Spark 4 hides Column↔Expression conversion behind private[sql]).
    */
  def rolling_hash(c: Column): Column = {
    import org.apache.spark.sql.graftshim.Bridge
    Bridge.column(RollingHash(Bridge.expression(c)))
  }
}
