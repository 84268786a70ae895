package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Size-`k` buffer of (score, id) pairs ordered best-first by
  * (score desc, id asc). Backed by a TreeSet keyed worst-first, so
  * insert is O(log k), the worst entry evicts in O(log k), and exact
  * (score, id) duplicates (the same candidate pair reached through two
  * LSH probe buckets) collapse for free. */
final class TopKBuffer(val k: Int) {
  // ascending "goodness": head = worst of the kept k
  val set = new java.util.TreeSet[(Double, Long)](
    new java.util.Comparator[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(a._1, b._1) // lower score = worse
        if (c != 0) c else java.lang.Long.compare(b._2, a._2) // higher id = worse
      }
    })

  def add(score: Double, id: Long): Unit = {
    if (set.size() < k) { set.add((score, id)); () }
    else {
      val worst = set.first()
      // strictly better than the current worst? (equal → keep existing)
      if (java.lang.Double.compare(score, worst._1) > 0 ||
          (score == worst._1 && id < worst._2)) {
        if (set.add((score, id))) set.pollFirst()
      }
    }
  }
}

/** Exact top-k by (score desc, id asc) as a map-side-combinable
  * aggregate: each partition keeps only its local best `k` pairs, the
  * shuffle then carries ≤ k rows per (partition, group) instead of
  * every candidate row, and partial buffers merge in O(k log k).
  *
  * This replaces the `row_number() OVER (PARTITION BY qid ...)` /
  * `WHERE rank <= k` reduction, whose single window funnels every
  * candidate row of a group into one task — at 100 TB a probe set
  * joined against a large corpus would serialize the whole candidate
  * stream through |probes| tasks. Here the reduction happens where the
  * candidates are produced.
  *
  * Input: struct(score: double, id: long). Output: array of
  * struct(id, score), best-first — `posexplode` yields (rank-1, row).
  */
case class TopKByScore(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] with UnaryLike[Expression] {

  require(k > 0, s"top-k needs k > 0, got $k")

  override def dataType: DataType = ArrayType(TopKByScore.entryType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1))
        buf.add(row.getDouble(0), row.getLong(1))
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    val it = other.set.iterator()
    while (it.hasNext) { val e = it.next(); buf.add(e._1, e._2) }
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val out = new Array[Any](buf.set.size())
    val it = buf.set.descendingIterator() // best first
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = new GenericInternalRow(Array[Any](e._2, e._1))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.set.size() * 16)
    bb.putInt(buf.set.size())
    val it = buf.set.iterator()
    while (it.hasNext) { val e = it.next(); bb.putDouble(e._1); bb.putLong(e._2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKByScore =
    copy(child = newChild)
}

object TopKByScore {
  val entryType: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false)))

  /** Column API: top-k of `struct(score double, id long)` pairs per
    * group, returned as array<struct<id, score>> best-first. */
  def topK(scoreAndId: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScore(ColumnBridge.expression(scoreAndId), k).toAggregateExpression())
}
