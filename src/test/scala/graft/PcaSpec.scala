package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** [[Similarity.pcaProject]]: the rounded power-iteration trajectory
  * must be partition-order invariant, and the iterated component must
  * actually capture dominant variance (sanity against a planted
  * direction). */
class PcaSpec extends AnyFunSuite with SparkSpec {

  private val dim = 8

  /** Corpus with a planted dominant direction e0 + small noise. */
  private def corpus(n: Int) = {
    val spark0 = spark
    import spark0.implicits._
    (0 until n).map { r =>
      val major = (r % 7 - 3).toDouble // spread along axis 0
      val vec = (0 until dim).map { c =>
        if (c == 0) major
        else ((r * 31 + c * 17) % 11 - 5) / 50.0 // small noise
      }
      (r.toLong, vec)
    }.toDF("nid", "vec")
  }

  test("projection is partition-order invariant") {
    val df = corpus(200)
    def run(parts: Int) =
      Similarity.pcaProject(df.repartition(parts), dim)
        .orderBy("vec_id").collect().map(_.getDouble(1)).toSeq
    assert(run(1) == run(13))
  }

  test("top component aligns with the planted dominant axis") {
    val pc = Similarity.pcaProject(corpus(200), dim)
    val joined = corpus(200).join(pc, col("nid") === col("vec_id"))
      .select(col("vec").getItem(0).as("x0"), col("pc1"))
    // |corr(pc1, axis-0 coordinate)| ≈ 1 when the component found the
    // planted direction
    val c = joined.agg(corr(col("pc1"), col("x0"))).collect()(0).getDouble(0)
    assert(math.abs(c) > 0.99, s"corr=$c")
  }
}
