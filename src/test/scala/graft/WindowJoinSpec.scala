package graft

import org.apache.spark.sql.functions._

import graft.operators.Temporal

/** Pair-exactness checks for Temporal.windowJoin: the bucketed
  * equijoin must emit every qualifying (left, right) pair EXACTLY
  * once — bucket-boundary pairs are where a wrong probe set drops or
  * doubles matches, so the fixtures sit right on the edges.
  */
class WindowJoinSpec extends SparkSpec {
  import spark.implicits._

  private val W = 100L

  test("windowJoin emits each in-window pair exactly once, boundaries half-open") {
    val left = Seq((1L, 10L, 200L)).toDF("lid", "k", "lt")
    // rights at lt-101 (out), lt-100 (in: >= lt-W), lt-1 (in),
    // lt (out: strictly before), lt+1 (out), other key (out)
    val right = Seq(
      (10L, 99L, "out_old"), (10L, 100L, "in_edge"), (10L, 199L, "in_near"),
      (10L, 200L, "out_eq"), (10L, 201L, "out_future"), (11L, 150L, "out_key"))
      .toDF("k", "rt", "tag")
    val got = Temporal.windowJoin(left, right, Seq("k"), "lt", "rt", W)
      .select("tag").as[String].collect().sorted
    assert(got.toSeq == Seq("in_edge", "in_near"))
  }

  test("windowJoin: no duplicate pairs when left and right share a bucket") {
    // left at 150 probes buckets 0 and 1; right at 120 lives in bucket
    // 1 only — one match despite the two probes.
    val left = Seq((1L, 10L, 150L)).toDF("lid", "k", "lt")
    val right = Seq((10L, 120L, "r1")).toDF("k", "rt", "tag")
    assert(Temporal.windowJoin(left, right, Seq("k"), "lt", "rt", W)
      .count() == 1)
  }

  test("windowJoin agrees with the naive inequality join on random data") {
    val rnd = new scala.util.Random(42)
    val left = (0 until 200)
      .map(i => (i.toLong, (rnd.nextInt(3)).toLong, rnd.nextInt(1000).toLong))
      .toDF("lid", "k", "lt")
    val right = (0 until 200)
      .map(i => (rnd.nextInt(3).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "rt", "rid")
    val fast = Temporal.windowJoin(left, right, Seq("k"), "lt", "rt", W)
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    val naive = left.join(right, Seq("k"))
      .where(col("rt") < col("lt") && col("rt") >= col("lt") - W)
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    assert(fast == naive)
    assert(fast.nonEmpty) // fixture actually exercises matches
  }
}
