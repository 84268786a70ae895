package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** All `m` product-quantization codes of one vector as a single fused
  * Catalyst expression with whole-stage codegen — the corpus-encoding
  * stage of [[graft.operators.Similarity.pqTopK]].
  *
  * The composed column form built, per subspace, an array of `nCodes`
  * `round(aggregate(zip_with(slice(vec, …), codewordLit, (x,y) ⇒
  * (x−y)²), 0.0, _+_), 6)` distances and took
  * `array_position(darr, array_min(darr))` — every distance evaluated
  * through interpreted higher-order-function lambdas (HOFs are
  * CodegenFallback), a fresh `slice` allocation per (subspace, code),
  * and the whole codebook inlined as literal trees m·nCodes times
  * (the before-plan was 206 KB of expression text; see
  * plans/r16/q_ann_pq_before.txt). This expression computes the same
  * codes in one generated loop over a compact codebook reference:
  * no allocations, no lambda dispatch, plan text collapses to one node.
  *
  * NUMERICALLY IDENTICAL to the column form, which the generated SQL
  * oracle replays:
  *  - per-(subspace, code) distance = the same sequential left-to-right
  *    fold of (v[d] − cb[d])² in index order, rounded half-up to 6
  *    decimals via `BigDecimal.valueOf` — the shortest-decimal form
  *    Spark's `Round` uses (see the parity note on
  *    [[LshBandKeysExpr]]);
  *  - code = the 1-based FIRST index of the minimum distance, compared
  *    under Spark's double ordering (`java.lang.Double.compare`, NaN
  *    greatest), exactly `array_position(d, array_min(d))`. Distances
  *    are sums of squares, so −0.0 can never arise and the first-min
  *    scan equals the equality-based position lookup.
  *
  * Parity with the column form is pinned property-style in
  * SimilarityPlanSpec. Vectors shorter than `dim` fail loudly (the
  * corpus contract is fixed-dimension embeddings).
  *
  * @param codebook row-major nCodes × dim doubles (full vectors; each
  *                 subspace reads its own slice)
  */
case class PqEncodeExpr(child: Expression, dim: Int, m: Int,
    nCodes: Int, codebook: Array[Double]) extends UnaryExpression {

  require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
  require(codebook.length == nCodes * dim,
    s"codebook has ${codebook.length} doubles, need ${nCodes * dim}")

  private def sub: Int = dim / m

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    require(v.numElements() >= dim,
      s"PqEncodeExpr: vector has ${v.numElements()} elements, need $dim")
    val w = sub
    val codes = new Array[Long](m)
    var s = 0
    while (s < m) {
      var bestIdx = 0
      var best = 0.0
      var c = 0
      while (c < nCodes) {
        var acc = 0.0
        var i = 0
        while (i < w) {
          val d = v.getDouble(s * w + i) - codebook(c * dim + s * w + i)
          acc += d * d
          i += 1
        }
        // NaN/Infinity skip the BigDecimal rounding (valueOf THROWS on
        // non-finite doubles, where Spark's Round passes them through
        // unchanged) and enter the compare as-is — same guard as
        // LshBandKeysExpr. NaN compares GREATEST under Double.compare,
        // so a NaN distance never beats any finite one.
        val r =
          if (java.lang.Double.isNaN(acc) || java.lang.Double.isInfinite(acc)) acc
          else java.math.BigDecimal.valueOf(acc)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        if (c == 0 || java.lang.Double.compare(r, best) < 0) {
          best = r; bestIdx = c
        }
        c += 1
      }
      codes(s) = bestIdx + 1L // array_position is 1-based
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cb = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val dd = ctx.freshName("dd")
      val r = ctx.freshName("r")
      val best = ctx.freshName("best")
      val bestIdx = ctx.freshName("bestIdx")
      val w = sub
      s"""
         |if ($v.numElements() < $dim) {
         |  throw new IllegalArgumentException(
         |    "PqEncodeExpr: vector has " + $v.numElements() +
         |    " elements, need $dim");
         |}
         |long[] $codes = new long[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $bestIdx = 0;
         |  double $best = 0.0;
         |  for (int $c = 0; $c < $nCodes; $c++) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $w; $i++) {
         |      double $dd = $v.getDouble($s * $w + $i) - $cb[$c * $dim + $s * $w + $i];
         |      $acc += $dd * $dd;
         |    }
         |    double $r = (Double.isNaN($acc) || Double.isInfinite($acc))
         |      ? $acc
         |      : java.math.BigDecimal.valueOf($acc)
         |          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue();
         |    if ($c == 0 || java.lang.Double.compare($r, $best) < 0) {
         |      $best = $r; $bestIdx = $c;
         |    }
         |  }
         |  $codes[$s] = $bestIdx + 1L;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncodeExpr {

  /** Column API: the `m` 1-based PQ codes of an array<double> column
    * against a codebook of full vectors (one per code). */
  def codes(vec: Column, dim: Int, m: Int,
      codebook: Array[Seq[Double]]): Column = {
    val flat = new Array[Double](codebook.length * dim)
    var c = 0
    while (c < codebook.length) {
      require(codebook(c).length == dim,
        s"codebook vector $c has ${codebook(c).length} dims, need $dim")
      var d = 0
      while (d < dim) { flat(c * dim + d) = codebook(c)(d); d += 1 }
      c += 1
    }
    ColumnBridge.column(PqEncodeExpr(
      ColumnBridge.expression(vec), dim, m, codebook.length, flat))
  }
}
