package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** KMV distinct sketch (`TextAnalysis.kmvDistinct`): exactness below k,
  * bounded relative error above k, multiset invariance (duplicates
  * never move the sketch), and the mergeability contract that makes it
  * a sketch and not just a sample — the sketch of a union equals the
  * merge-and-truncate of the parts' sketches.
  */
class KmvSpec extends SparkSpec {

  private val k = 64

  test("groups with fewer than k distinct values report the exact count") {
    import spark.implicits._
    val rows = (0 until 40).flatMap(i => Seq(("small", s"v$i"), ("small", s"v$i")))
      .toDF("g", "v")
    val got = TextAnalysis.kmvDistinct(rows, "g", "v", k)
      .select("kmv_distinct", "kmv_size").as[(Long, Long)].head()
    assert(got == ((40L, 40L)))
  }

  test("estimate lands within 25% of a 10k-distinct planted domain") {
    import spark.implicits._
    val rows = (0 until 10000).map(i => ("big", s"tok_$i")).toDF("g", "v")
    val est = TextAnalysis.kmvDistinct(rows, "g", "v", k)
      .select("kmv_distinct").as[Long].head()
    // k=64 → relative std-err ~ 1/sqrt(k-2) ≈ 12.7%; 25% is ~2σ
    assert(est > 7500 && est < 12500, s"estimate $est")
  }

  test("duplicates never change the sketch (multiset invariance)") {
    import spark.implicits._
    val base = (0 until 5000).map(i => ("g", s"tok_$i"))
    val once = base.toDF("g", "v")
    val thrice = (base ++ base ++ base).toDF("g", "v")
    val a = TextAnalysis.kmvDistinct(once, "g", "v", k)
      .select("kmv_distinct").as[Long].head()
    val b = TextAnalysis.kmvDistinct(thrice, "g", "v", k)
      .select("kmv_distinct").as[Long].head()
    assert(a == b)
  }

  test("overlap: sub-k pairs report exact intersection and union") {
    import spark.implicits._
    // |A|=30, |B|=25, |A∩B|=15 — both sketches complete, so the merged
    // sketch IS the union and every estimate must be exact
    val rows = ((0 until 30).map(i => ("a", s"v$i")) ++
      (15 until 40).map(i => ("b", s"v$i"))).toDF("g", "v")
    val got = TextAnalysis.kmvOverlap(rows, "g", "v", k)
      .select("src_a", "src_b", "k_common", "union_est", "inter_est")
      .as[(String, String, Long, Long, Long)].head()
    assert(got == (("a", "b", 15L, 40L, 15L)))
  }

  test("overlap: estimates land near truth on a 8k/8k pair sharing half") {
    import spark.implicits._
    // A = [0, 8000), B = [4000, 12000): union 12000, intersection 4000
    val rows = ((0 until 8000).map(i => ("a", s"tok_$i")) ++
      (4000 until 12000).map(i => ("b", s"tok_$i"))).toDF("g", "v")
    val (kc, u, i) = TextAnalysis.kmvOverlap(rows, "g", "v", k)
      .select("k_common", "union_est", "inter_est")
      .as[(Long, Long, Long)].head()
    assert(u > 9000 && u < 15000, s"union_est $u")
    assert(i > 2400 && i < 5600, s"inter_est $i (k_common=$kc)")
  }

  test("sketch of the union == union of the sketches (mergeability)") {
    import spark.implicits._
    // two overlapping halves; merging = re-sketching their sketch rows
    val left = (0 until 6000).map(i => ("m", s"tok_$i"))
    val right = (3000 until 9000).map(i => ("m", s"tok_$i"))
    val whole = TextAnalysis.kmvDistinct((left ++ right).toDF("g", "v"), "g", "v", k)
      .select("kmv_distinct").as[Long].head()
    // per-part sketches keep the raw values alive by re-deriving from
    // the k smallest hashes' PREIMAGES: simulate by unioning the two
    // parts' value sets filtered to each part's own k smallest hashes
    val h = TextAnalysis.hash52(col("v"))
    def part(rows: Seq[(String, String)]) = rows.toDF("g", "v")
      .select(col("v"), h.as("h")).distinct()
      .orderBy("h").limit(k)
    val merged = TextAnalysis.kmvDistinct(
      part(left).union(part(right)).select(lit("m").as("g"), col("v")),
      "g", "v", k)
      .select("kmv_distinct").as[Long].head()
    assert(whole == merged, s"whole=$whole merged=$merged")
  }
}
