package graft

import graft.operators.Temporal

/** Closed-form checks for the exact-moment time-series statistics:
  * autocorrelation (Temporal.acf) and the CUSUM changepoint scan
  * (Temporal.cusum). Every expected value below is derived by hand
  * from the integer-moment formulas, so a drifting scale factor or an
  * off-by-one in the partial sums fails loudly.
  */
class TemporalStatsSpec extends SparkSpec {
  import spark.implicits._

  private def series(key: Long, vs: Seq[Double]) =
    vs.zipWithIndex.map { case (v, i) => (key, i.toLong, i.toLong, v) }

  test("acf: alternating series has acf_1 = -(n-1)/n, acf_2 = (n-2)/n") {
    // mean is exactly 0, so r_k = sum(c_t * c_{t+k}) / sum(c^2):
    // n = 8 alternating +-1 -> r1 = -7/8, r2 = 6/8, r3 = -5/8.
    val df = series(1L, Seq(1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0))
      .toDF("k", "t", "tie", "v")
    val r = Temporal.acf(df, "k", "t", "tie", "v", maxLag = 3).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n") == 8)
    assert(r(0).getAs[Double]("acf_1") == -0.875)
    assert(r(0).getAs[Double]("acf_2") == 0.75)
    assert(r(0).getAs[Double]("acf_3") == -0.625)
  }

  test("acf: constant series (zero variance) and short series drop") {
    val df = (series(1L, Seq(5.0, 5.0, 5.0, 5.0, 5.0)) ++
      series(2L, Seq(1.0, 2.0, 3.0))).toDF("k", "t", "tie", "v")
    // key 1: denom = 0; key 2: n = 3 = maxLag -> both dropped
    assert(Temporal.acf(df, "k", "t", "tie", "v", maxLag = 3).count() == 0)
  }

  test("acf: order comes from (time, tie), not input order") {
    val shuffled = scala.util.Random.shuffle(
      series(7L, Seq(1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0)))
    val r = Temporal.acf(shuffled.toDF("k", "t", "tie", "v"),
      "k", "t", "tie", "v", maxLag = 1).collect()
    assert(r(0).getAs[Double]("acf_1") == -0.875)
  }

  test("cusum: level shift peaks at the last pre-shift row") {
    // c = (0,0,0,0,1000,1000,1000,1000): S = 4000, n = 8,
    // dev = 8c - 4000 -> cum walks to -16000 at row 3 then back.
    val df = series(1L, Seq(0.0, 0.0, 0.0, 0.0, 10.0, 10.0, 10.0, 10.0))
      .toDF("k", "t", "tie", "v")
    val r = Temporal.cusum(df, "k", "t", "tie", "v").collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("cp") == 3L)
    assert(r(0).getAs[Long]("stat") == 16000L)
    assert(r(0).getAs[Long]("n") == 8L)
  }

  test("cusum: tied peaks resolve to the FIRST achieving row") {
    // c = (0,1000,0,1000): cum = (-2000, 0, -2000, 0) -> |peak| 2000
    // at rows 0 and 2; the first one wins.
    val df = series(1L, Seq(0.0, 10.0, 0.0, 10.0)).toDF("k", "t", "tie", "v")
    val r = Temporal.cusum(df, "k", "t", "tie", "v").collect()
    assert(r(0).getAs[Long]("cp") == 0L)
    assert(r(0).getAs[Long]("stat") == 2000L)
  }

  test("cusum: single-row keys drop") {
    val df = (series(1L, Seq(3.0)) ++ series(2L, Seq(1.0, 2.0)))
      .toDF("k", "t", "tie", "v")
    val got = Temporal.cusum(df, "k", "t", "tie", "v").collect()
    assert(got.map(_.getAs[Long]("k")).toSeq == Seq(2L))
  }
}
