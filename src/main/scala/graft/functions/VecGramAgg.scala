package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Gram matrix (XᵀX) of an `array<double>` embedding column as ONE
  * map-side-combinable aggregate — the distributed linear-algebra
  * primitive behind PCA / whitening / covariance readouts.
  *
  * Each partition accumulates the dim·(dim+1)/2 upper-triangle sums
  * into a single fixed-size double buffer; the shuffle then carries
  * ONE buffer per partition (a few KB) regardless of corpus size, and
  * buffers merge element-wise. The naive relational form — explode the
  * vector twice and groupBy (i, j) — shuffles |corpus|·dim² rows; this
  * shuffles |partitions| buffers. At 100 TB that is the difference
  * between a pure map pass and an unrunnable 10¹⁵-row exchange.
  *
  * Output: array<double> of length dim·(dim+1)/2, the upper triangle
  * in row-major order (i ≤ j): index(i,j) = i·dim − i·(i−1)/2 + (j−i).
  * Rows with a wrong-length or null vector are skipped (not an error),
  * matching the tolerant null semantics of the built-in aggregates.
  */
case class VecGramAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  require(dim > 0, s"gram matrix needs dim > 0, got $dim")

  private val triLen = dim * (dim + 1) / 2

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Double] = new Array[Double](triLen)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (arr.numElements() == dim) {
        var i = 0
        var k = 0
        while (i < dim) {
          val xi = arr.getDouble(i)
          var j = i
          while (j < dim) {
            buf(k) += xi * arr.getDouble(j)
            k += 1
            j += 1
          }
          i += 1
        }
      }
    }
    buf
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    var k = 0
    while (k < triLen) { buf(k) += other(k); k += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any =
    new GenericArrayData(buf.map(java.lang.Double.valueOf(_): Any))

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(triLen * 8)
    var k = 0
    while (k < triLen) { bb.putDouble(buf(k)); k += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Double](triLen)
    var k = 0
    while (k < triLen) { buf(k) = bb.getDouble; k += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecGramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecGramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecGramAgg =
    copy(child = newChild)
}

object VecGramAgg {
  /** Column API: upper-triangle XᵀX sums of a dim-length
    * `array<double>` column, row-major (i ≤ j). */
  def gram(vec: Column, dim: Int): Column =
    ColumnBridge.column(
      VecGramAgg(ColumnBridge.expression(vec), dim).toAggregateExpression())
}
