package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** One-pass MinHash signature of a gram array — md5-hash each gram and
  * fold all permutation minima in a single tight loop.
  *
  * Why a native expression: the streaming signature path cannot use
  * the batch form's explode + 32 codegen'd min AGGREGATES (no
  * aggregation ahead of a stateful operator in an append stream), and
  * the per-row alternative composed from `transform`/`array_min`
  * lambdas is CodegenFallback — interpreted expression-tree evaluation
  * per array ELEMENT per permutation, the exact
  * non-codegen-in-the-hot-path shape this codebase avoids (measured:
  * the interpreted fold put q_stream_dedup_lsh at 7.5 s @ sf0.1; this
  * expression takes the same query to ~3 s). Whole-stage codegen emits
  * one static call per row; the loop hashes each gram ONCE
  * (MessageDigest, thread-local) and updates all k minima in place —
  * O(|grams|·k) long ops, no boxing, no per-element dispatch.
  *
  * Bit-compatibility contract (pinned by the rowwise-vs-batch parity
  * test in StreamingDedupSpec): the per-gram base hash equals Spark's
  * `conv(substring(md5(g), 1, 15), 16, 10)` — the first 15 hex digits
  * of the md5, i.e. the first 60 bits of the digest — reduced mod `p`,
  * exactly like [[graft.operators.Dedup.baseHash]].
  */
object MinHashSigsRT {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Called from generated code — Java-friendly signature. */
  def sigs(arr: ArrayData, a: Array[Long], b: Array[Long],
      p: Long): GenericArrayData = {
    val k = a.length
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val digest = md.get()
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      digest.reset()
      val d = digest.digest(arr.getUTF8String(j).getBytes)
      // first 15 hex digits = bytes 0..6 plus the high nibble of byte 7
      var v = 0L
      var i = 0
      while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
      v = (v << 4) | ((d(7) & 0xffL) >>> 4)
      val h = v % p
      i = 0
      while (i < k) {
        val x = (a(i) * h + b(i)) % p
        if (x < out(i)) out(i) = x
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Catalyst expression: array<string> grams → array<long> of the k
  * permutation minima. */
case class MinHashSigsExpr(child: Expression, a: Array[Long],
    b: Array[Long], p: Long) extends UnaryExpression {

  require(a.length == b.length && a.nonEmpty && p > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigsRT.sigs(input.asInstanceOf[ArrayData], a, b, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhPermA", a, "long[]")
    val bRef = ctx.addReferenceObj("mhPermB", b, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSigsRT.sigs($c, $aRef, $bRef, ${p}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigs {
  /** Column API: signature array of an array<string> gram column. */
  def sigs(grams: Column, perms: Seq[(Long, Long)], p: Long): Column =
    ColumnBridge.column(MinHashSigsExpr(ColumnBridge.expression(grams),
      perms.map(_._1).toArray, perms.map(_._2).toArray, p))
}
