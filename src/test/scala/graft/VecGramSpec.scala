package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VecGramAgg

/** [[VecGramAgg]]: the one-pass gram matrix must equal an exact
  * reference computation over the quantized elements, be BIT-identical
  * under any partitioning (integer sums commute — the raw-double
  * predecessor flipped a 6th decimal between runs), and skip
  * null/wrong-length rows. */
class VecGramSpec extends AnyFunSuite with SparkSpec {

  private val dim = 4

  private def rawVecs(n: Int): Seq[Seq[Double]] =
    (0 until n).map { r =>
      (0 until dim).map(c => ((r * 31 + c * 17) % 13 - 6) / 3.0 + 0.0000007 * r)
    }

  private def df(vs: Seq[Seq[Double]]) = {
    val spark0 = spark
    import spark0.implicits._
    vs.toDF("vec")
  }

  private def quantize(x: Double): Long = {
    val s = x * 1e6
    if (s >= 0) Math.round(s) else -Math.round(-s)
  }

  /** Exact driver-side reference over quantized elements. */
  private def reference(vs: Seq[Seq[Double]]): Seq[Long] = {
    val out = Array.fill(dim * (dim + 1) / 2)(0L)
    vs.foreach { v =>
      val q = v.map(quantize)
      var k = 0
      for (i <- 0 until dim; j <- i until dim) { out(k) += q(i) * q(j); k += 1 }
    }
    out.toSeq
  }

  test("matches the exact quantized reference") {
    val vs = rawVecs(57)
    val got = df(vs).agg(VecGramAgg.gram(col("vec"), dim).as("g"))
      .collect()(0).getSeq[Long](0)
    assert(got == reference(vs))
  }

  test("bit-identical under any partitioning") {
    val vs = rawVecs(101)
    def run(parts: Int) =
      df(vs).repartition(parts)
        .agg(VecGramAgg.gram(col("vec"), dim).as("g"))
        .collect()(0).getSeq[Long](0)
    assert(run(1) == run(7) && run(7) == run(29))
  }

  test("null and wrong-length vectors are skipped") {
    val spark0 = spark
    import spark0.implicits._
    val base = Seq(Seq(1.0, 2.0, 3.0, 4.0), Seq(2.0, 0.0, 1.0, 1.0))
    val noisy = (base.map(Option(_)) ++
      Seq(Option.empty[Seq[Double]], Some(Seq(9.0)))).toDF("vec")
    val clean = base.toDF("vec")
    def g(d: org.apache.spark.sql.DataFrame) =
      d.agg(VecGramAgg.gram(col("vec"), dim).as("g"))
        .collect()(0).getSeq[Long](0)
    assert(g(noisy) == g(clean))
  }
}
