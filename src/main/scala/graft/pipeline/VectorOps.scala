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

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity between two double-array columns. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
