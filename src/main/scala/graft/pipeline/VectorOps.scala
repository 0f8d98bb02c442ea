package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives as codegen-friendly higher-order functions —
  * no UDFs, no per-row JVM allocation beyond the array itself (north-star
  * similarity-search operators; no reference analog, the reference has no
  * vector surface — SURVEY §2.8).
  */
object VectorOps {
  /** Cast a float array column to double before arithmetic so accumulation
    * happens in double precision end-to-end.
    */
  def asDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Primitive-loop dot product (codegen'd [[graft.functions.ArrayDot]]) —
    * the hot path of every pairwise similarity join.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.ArrayDot.array_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity between two double-array columns. On pairwise
    * joins prefer [[normalized]] + [[dot]]: normalize each side ONCE
    * (linear cost), then each pair is a single dot product. A zero
    * vector has no direction — similarity is null, not a DIVIDE_BY_ZERO
    * (which is a query-killing ERROR under Spark 4's ANSI default).
    */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    org.apache.spark.sql.functions.when(denom =!= 0.0, dot(a, b) / denom)
  }

  /** Unit-normalized copy of a double-array column (codegen'd
    * [[graft.functions.ArrayNormalize]] — the HOF form re-evaluated the
    * norm per element; see that expression's doc). Zero vectors pass
    * through unchanged instead of fanning out NaN.
    */
  def normalized(a: Column): Column =
    graft.functions.ArrayNormalize.array_normalize(a)
}
