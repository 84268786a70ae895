package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Content-defined anchor positions over a byte string, via a ROLLING
  * polynomial hash — O(1) per byte, one pass per row.
  *
  * A position p is an anchor iff the hash of the `gram` bytes starting
  * at p falls in class 0 of `classes`; anchors are reported only while
  * a full `window` still fits (p ≤ n − window). Because the decision
  * depends only on local CONTENT, two copies of a repeated span select
  * the same windows at ANY byte alignment — the content-defined
  * chunking idea (gear/Rabin CDC, as in FastCDC/LBFS) that makes
  * substring dedup shuffle-friendly without a suffix array.
  *
  * The hash is deliberately simple modular arithmetic — NOT md5 — so
  * the DuckDB oracle can reproduce it bit-for-bit in plain SQL:
  *
  *   gear(b) = (b * 2654435761) mod 65536      (Knuth multiplicative)
  *   h(p)    = Σ gear(b_{p+i}) · 31^(gram−1−i)  mod 1000000007
  *
  * All intermediates stay under 2^63 with mod interleaved per step, so
  * the same Horner chain evaluates exactly in any 64-bit-integer SQL
  * engine. Rolling update per byte:
  *   h(p+1) = ((h(p) − gear(b_p)·31^(gram−1)) · 31 + gear(b_{p+gram}))
  *            mod 1000000007
  */
object RollingAnchorRT {
  final val B = 31L
  final val M = 1000000007L

  @inline private def gear(b: Byte): Long =
    (b & 0xff).toLong * 2654435761L % 65536L

  /** Anchor positions (0-based byte offsets), ascending. Called from
    * generated code — keep the signature Java-friendly. */
  def anchors(bytes: Array[Byte], gram: Int, window: Int,
      classes: Int): GenericArrayData = {
    val n = bytes.length
    val last = n - window // inclusive max anchor position
    // last < 0 covers n < window; the explicit n < gram guard matters
    // when window < gram (otherwise the init loop reads past the array)
    if (last < 0 || n < gram) return new GenericArrayData(Array.emptyIntArray)
    var bp = 1L // B^(gram-1) mod M
    var i = 0
    while (i < gram - 1) { bp = bp * B % M; i += 1 }
    var h = 0L
    i = 0
    while (i < gram) { h = (h * B + gear(bytes(i))) % M; i += 1 }
    val buf = new scala.collection.mutable.ArrayBuilder.ofInt
    var p = 0
    while (p <= last) {
      if (h % classes == 0) buf += p
      if (p + gram < n)
        h = ((h - gear(bytes(p)) * bp % M + M) % M * B + gear(bytes(p + gram))) % M
      p += 1
    }
    new GenericArrayData(buf.result())
  }
}

/** Catalyst expression over a binary column; whole-stage codegen emits
  * one static call per row (the loop itself is branch-light JIT food). */
case class RollingAnchorsExpr(child: Expression, gram: Int, window: Int,
    classes: Int) extends UnaryExpression {

  require(gram > 0 && classes > 0 && window >= gram,
    s"RollingAnchorsExpr needs 0 < gram <= window and classes > 0 " +
      s"(got gram=$gram, window=$window, classes=$classes)")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    RollingAnchorRT.anchors(input.asInstanceOf[Array[Byte]], gram, window, classes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingAnchorRT.anchors($c, $gram, $window, $classes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingAnchor {
  /** Column API: anchor byte-positions of a BINARY column. */
  def anchors(bytes: Column, gram: Int, window: Int, classes: Int): Column =
    ColumnBridge.column(
      RollingAnchorsExpr(ColumnBridge.expression(bytes), gram, window, classes))

  /** The SAME hash as a DuckDB SQL expression over `hexCol` (an
    * UPPERCASE hex encoding of the bytes) at 0-based byte offset
    * `posCol` — the oracle stays in lock-step with the Scala rolling
    * loop by construction (identical gear, base, modulus, and
    * per-step mod interleaving). */
  def duckDbHashSql(hexCol: String, posCol: String, gram: Int): String = {
    def gearAt(i: Int) =
      s"((('0x' || substr($hexCol, ($posCol + $i) * 2 + 1, 2))::BIGINT * 2654435761) % 65536)"
    (1 until gram).foldLeft(gearAt(0)) { (acc, i) =>
      s"(($acc) * 31 + ${gearAt(i)}) % 1000000007"
    }
  }
}
