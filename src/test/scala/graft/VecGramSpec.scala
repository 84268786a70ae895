package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VecGramAgg

/** [[VecGramAgg]]: the one-pass gram matrix must equal the relational
  * explode²+groupBy form, be invariant to partitioning (after the
  * 6-decimal rounding convention), and skip null/wrong-length rows. */
class VecGramSpec extends AnyFunSuite with SparkSpec {

  private val dim = 4

  private def vecs(n: Int) = {
    val spark0 = spark
    import spark0.implicits._
    (0 until n).map { r =>
      (r.toLong, (0 until dim).map(c => ((r * 31 + c * 17) % 13 - 6) / 3.0))
    }.toDF("id", "vec")
  }

  private def triIdx = for { i <- 0 until dim; j <- i until dim } yield (i, j)

  test("matches the relational explode form exactly") {
    val df = vecs(57)
    val got = df.agg(VecGramAgg.gram(col("vec"), dim).as("g"))
      .select(col("g")).collect()(0).getSeq[Double](0)
    val exp = triIdx.map { case (i, j) =>
      df.select(sum(col("vec").getItem(i) * col("vec").getItem(j)))
        .collect()(0).getDouble(0)
    }
    got.zip(exp).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-9, s"got $g expected $e")
    }
  }

  test("partition-order invariant after round-6") {
    val df = vecs(101)
    def run(parts: Int) =
      df.repartition(parts)
        .agg(VecGramAgg.gram(col("vec"), dim).as("g"))
        .select(explode(col("g")).as("v"))
        .select(round(col("v"), 6)).collect().map(_.getDouble(0)).toSeq
    assert(run(1) == run(7))
  }

  test("null and wrong-length vectors are skipped") {
    val spark0 = spark
    import spark0.implicits._
    val base = Seq(Seq(1.0, 2.0, 3.0, 4.0), Seq(2.0, 0.0, 1.0, 1.0))
    val noisy = (base.map(Option(_)) ++
      Seq(Option.empty[Seq[Double]], Some(Seq(9.0)))).toDF("vec")
    val clean = base.toDF("vec")
    def g(df: org.apache.spark.sql.DataFrame) =
      df.agg(VecGramAgg.gram(col("vec"), dim).as("g"))
        .collect()(0).getSeq[Double](0)
    assert(g(noisy) == g(clean))
  }
}
