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
  * into a single fixed-size buffer; the shuffle then carries ONE
  * buffer per partition (a few KB) regardless of corpus size, and
  * buffers merge element-wise. The naive relational form — explode the
  * vector twice and groupBy (i, j) — shuffles |corpus|·dim² rows; this
  * shuffles |partitions| buffers. At 100 TB that is the difference
  * between a pure map pass and an unrunnable 10¹⁵-row exchange.
  *
  * DETERMINISM: floating-point partial sums would vary with partition
  * MERGE ORDER run to run — a sum landing on a rounding boundary then
  * flips the 6-decimal readout nondeterministically (observed: a PCA
  * eigenvector shifted between two runs over identical data). So the
  * aggregate is exact instead: each element quantizes ONCE to
  * `scale` decimals (half away from zero — the convention shared by
  * java.math.RoundingMode.HALF_UP and DuckDB round()), and the buffer
  * holds exact Long sums of the integer products. Integer addition
  * commutes, so any partition/merge order yields bit-identical output.
  * Overflow bound: n·(10^scale·max|x|)² must stay below 2⁶³ —
  * ~9.2M unit-norm-ish vectors at scale=6; shard-and-sum beyond that.
  *
  * Output: array<long> of length dim·(dim+1)/2, the upper triangle of
  * Σ q(xᵢ)·q(xⱼ) in row-major order (i ≤ j). Callers descale by
  * 10^(2·scale) (double division — exact inputs, one IEEE op). Rows
  * with a null or wrong-length vector are skipped, matching the
  * tolerant null semantics of the built-in aggregates.
  */
case class VecGramAgg(
    child: Expression,
    dim: Int,
    scale: Int = 6,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(dim > 0, s"gram matrix needs dim > 0, got $dim")
  require(scale >= 0 && scale <= 9, s"scale out of range: $scale")

  private val triLen = dim * (dim + 1) / 2
  private val factor = math.pow(10.0, scale)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](triLen)

  /** Half-away-from-zero at `scale` decimals, as a scaled Long —
    * matches DuckDB round() and BigDecimal HALF_UP exactly. */
  private def quantize(x: Double): Long = {
    val s = x * factor
    if (s >= 0) Math.round(s) else -Math.round(-s)
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (arr.numElements() == dim) {
        val q = new Array[Long](dim)
        var i = 0
        while (i < dim) { q(i) = quantize(arr.getDouble(i)); i += 1 }
        var k = 0
        i = 0
        while (i < dim) {
          val qi = q(i)
          var j = i
          while (j < dim) {
            buf(k) += qi * q(j)
            k += 1
            j += 1
          }
          i += 1
        }
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var k = 0
    while (k < triLen) { buf(k) += other(k); k += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(java.lang.Long.valueOf(_): Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(triLen * 8)
    var k = 0
    while (k < triLen) { bb.putLong(buf(k)); k += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](triLen)
    var k = 0
    while (k < triLen) { buf(k) = bb.getLong; k += 1 }
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
  /** Column API: exact scaled-integer upper-triangle XᵀX sums of a
    * dim-length `array<double>` column, row-major (i ≤ j). Descale by
    * 10^(2·scale) for the real-valued gram entries. */
  def gram(vec: Column, dim: Int, scale: Int = 6): Column =
    ColumnBridge.column(
      VecGramAgg(ColumnBridge.expression(vec), dim, scale).toAggregateExpression())
}
