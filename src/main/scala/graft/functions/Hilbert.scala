package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Hilbert curve index: maps (x, y) to its distance along the
  * order-`k` Hilbert curve. Same layout role as [[ZOrder]] — sort or
  * range-partition by the index and every output file gets a small
  * 2-D bounding box — but with strictly better locality: consecutive
  * curve positions are always GRID NEIGHBORS (no Morton "jumps"
  * across the plane at quadrant boundaries), so file bounding boxes
  * are tighter and min/max pruning discards more files for the same
  * range predicate. The cost is that the index is iterative (one
  * rotate/reflect step per bit, not a parallel bit-interleave), which
  * is why it is a compiled [[HilbertExpr]] rather than a
  * `functions._` bit-op chain.
  *
  * The per-step transform (top bit down, `s` the step's bit):
  * quadrant = (rx, ry) from bit `s` of x and y; the step adds
  * s²·gray(rx,ry) to the distance (gray order 0,1,3,2); the low bits
  * then mask to [0, s) and rotate — swap on ry=0, reflect-and-swap on
  * (rx=1, ry=0). HilbertSpec pins bijectivity and the
  * every-step-is-a-grid-neighbor property; the identical unrolled
  * arithmetic is emitted as chained DuckDB CTEs by [[duckDbSql]].
  */
object Hilbert {

  /** Curve distance of (x, y) at `order` bits per dimension. Inputs
    * pre-mask to [0, 2^order); order ≤ 31 keeps d a positive long. */
  def hilbertD(x0: Long, y0: Long, order: Int): Long = {
    val mask = (1L << order) - 1
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      val xm = x & (s - 1)
      val ym = y & (s - 1)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - ym; y = s - 1 - xm }
        else { x = ym; y = xm }
      } else { x = xm; y = ym }
      s >>= 1
    }
    d
  }

  /** Column API: Hilbert curve distance of two integral columns. */
  def hilbert(x: Column, y: Column, order: Int): Column =
    ColumnBridge.column(HilbertExpr(
      ColumnBridge.expression(x.cast("long")),
      ColumnBridge.expression(y.cast("long")), order))

  /** The same computation as a chain of DuckDB CTEs (the iterative
    * rotate/reflect cannot inline as one expression without
    * exponential blowup, so the oracle unrolls one CTE per bit).
    *
    * @param inner SQL producing columns `x`, `y` plus any carry-through
    *              columns in `carry`
    * @return CTE list body: `h0 AS (...), h1 AS (...), ..., h{order}`
    *         — final relation has `carry` columns plus `d`
    */
  def duckDbCtes(inner: String, carry: Seq[String], order: Int): (String, String) = {
    val carrySql = carry.mkString(", ")
    val first = s"h0 AS (SELECT $carrySql, CAST(0 AS BIGINT) AS d, " +
      s"(x & ${(1L << order) - 1}) AS x, (y & ${(1L << order) - 1}) AS y " +
      s"FROM ($inner))"
    val steps = (0 until order).map { i =>
      val s = 1L << (order - 1 - i)
      val ss = s * s
      val sm = s - 1
      val rx = s"CASE WHEN (x & ${s}) > 0 THEN 1 ELSE 0 END"
      val ry = s"CASE WHEN (y & ${s}) > 0 THEN 1 ELSE 0 END"
      s"""h${i + 1} AS (SELECT $carrySql,
         |  d + $ss * (CASE WHEN ($rx) = 0 AND ($ry) = 0 THEN 0
         |             WHEN ($rx) = 0 THEN 1
         |             WHEN ($ry) = 1 THEN 2 ELSE 3 END) AS d,
         |  CASE WHEN ($ry) = 0 THEN
         |      (CASE WHEN ($rx) = 1 THEN $sm - (y & $sm) ELSE (y & $sm) END)
         |    ELSE (x & $sm) END AS x,
         |  CASE WHEN ($ry) = 0 THEN
         |      (CASE WHEN ($rx) = 1 THEN $sm - (x & $sm) ELSE (x & $sm) END)
         |    ELSE (y & $sm) END AS y
         |  FROM h$i)""".stripMargin
    }
    ((first +: steps).mkString(",\n"), s"h$order")
  }
}

/** Catalyst expression calling the static [[Hilbert.hilbertD]] from
  * generated code — one static call per row inside whole-stage
  * codegen. */
case class HilbertExpr(left: Expression, right: Expression, order: Int)
    extends BinaryExpression {

  require(order >= 1 && order <= 31, s"order must be in [1,31], got $order")

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Hilbert.hilbertD(a.asInstanceOf[Long], b.asInstanceOf[Long], order)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Hilbert.hilbertD($a, $b, $order);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
