package graft

import org.apache.spark.sql.functions._

import graft.operators.GraphOps

/** Integer PageRank (`GraphOps.pageRank`): rank order on a known
  * graph, mass accounting, and bit-exact partition-layout
  * independence (the property the integer arithmetic buys).
  */
class PageRankSpec extends SparkSpec {

  test("star graph: the hub out-ranks every spoke") {
    import spark.implicits._
    // 5 spokes all pointing at the hub (0), hub pointing back at one
    val edges = (Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (5L, 0L), (0L, 1L)))
      .toDF("src", "dst")
    val r = GraphOps.pageRank(edges, "src", "dst", iters = 3)
      .as[(Long, Long)].collect().toMap
    val hub = r(0L)
    assert((1L to 5L).forall(s => r(s) < hub), r.toString)
    // spoke 1 receives the hub's whole contribution → beats spokes 2-5
    assert((2L to 5L).forall(s => r(s) < r(1L)), r.toString)
  }

  test("mass stays bounded and positive") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(2000)((rnd.nextLong(200), rnd.nextLong(200)))
      .filter { case (a, b) => a != b }.toDF("src", "dst")
    val ranks = GraphOps.pageRank(edges, "src", "dst", iters = 3)
    val Array(row) = ranks.agg(sum("rank_ppt"), min("rank_ppt")).collect()
    val (total, lo) = (row.getLong(0), row.getLong(1))
    // ≤ full mass (integer division + dangling drop lose, never gain);
    // ≥ teleport share; every node keeps at least the teleport base
    assert(total <= 1000000000000L && total > 150000000000L, total.toString)
    assert(lo > 0L, lo.toString)
  }

  test("ranks are bit-identical across partition layouts") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val edges = Seq.fill(3000)((rnd.nextLong(300), rnd.nextLong(300)))
      .filter { case (a, b) => a != b }.toDF("src", "dst")
    def run(parts: Int) =
      GraphOps.pageRank(edges.repartition(parts), "src", "dst", iters = 3)
        .as[(Long, Long)].collect().toMap
    assert(run(1) == run(13))
  }
}
