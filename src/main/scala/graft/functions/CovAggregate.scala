package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** One-pass covariance statistics over an `array<double>` column as a
  * native `TypedImperativeAggregate` (the MinHash/SimHash discipline):
  * buffer = [n, Σx (d), Σxᵢxⱼ (upper triangle)], map-side partial
  * merge, one ~(d²/2)-double buffer per partition boundary instead of
  * any per-pair shuffle. The naive formulation — explode to (vec, i,
  * xᵢ), self-join on vec, groupBy (i, j) — shuffles n·d²/2 rows
  * (≈ 166 M at sf0.1, petarows at 100 TB); this aggregate shuffles
  * #partitions buffers, full stop. Downstream (the PCA driver step)
  * consumes the single collected row.
  */
case class CovSketch(child: Expression, d: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  private val len = 1 + d + d * (d + 1) / 2

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cov_sketch expects array<double>, got ${t.sql}")
  }

  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](len)

  override def update(b: Array[Double], row: InternalRow): Array[Double] = {
    val v = child.eval(row)
    if (v != null) {
      val x = v.asInstanceOf[ArrayData]
      if (x.numElements() == d) {
        b(0) += 1.0
        var i = 0
        var p = 1 + d
        while (i < d) {
          val xi = x.getDouble(i)
          b(1 + i) += xi
          var j = i
          while (j < d) {
            b(p) += xi * x.getDouble(j)
            p += 1
            j += 1
          }
          i += 1
        }
      }
    }
    b
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < len) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(b: Array[Double]): Any = new GenericArrayData(b.clone())

  override def serialize(b: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(len * 8)
    var i = 0
    while (i < len) { bb.putDouble(b(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Double](len)
    var i = 0
    while (i < len) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): CovSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CovSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): CovSketch = copy(child = c.head)
}

object CovSketch {
  def cov_sketch(c: Column, d: Int): Column = {
    import org.apache.spark.sql.graftshim.Bridge
    Bridge.column(CovSketch(Bridge.expression(c), d)
      .toAggregateExpression())
  }

  /** Upper-triangle covariance entries from a collected stats buffer:
    * cov(i, j) = Σxᵢxⱼ/n − (Σxᵢ/n)(Σxⱼ/n).
    */
  def covEntries(stats: Array[Double], d: Int): Seq[(Int, Int, Double)] = {
    val n = stats(0)
    // an empty frame yields n = 0 and every entry 0/0 = NaN, which
    // would surface downstream as an obscure singular-matrix failure
    // in the inverse instead of a clear message here
    require(n > 0,
      s"cov_sketch saw no rows of the declared dimension d=$d")
    var p = 1 + d
    val out = Seq.newBuilder[(Int, Int, Double)]
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        out += ((i, j,
          stats(p) / n - (stats(1 + i) / n) * (stats(1 + j) / n)))
        p += 1
        j += 1
      }
      i += 1
    }
    out.result()
  }
}
