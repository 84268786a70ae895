package graft

import graft.operators.GraphOps

/** Multi-source BFS (`GraphOps.shortestPaths`): closed-form hop
  * distances, the frontier-per-round bound, multi-seed min, and input
  * normalization (direction/duplicates/self-loops).
  */
class ShortestPathsSpec extends SparkSpec {

  import spark.implicits._

  private def dists(edges: Seq[(Long, Long)], seeds: Seq[Long],
      rounds: Int): Map[Long, Long] =
    GraphOps.shortestPaths(edges.toDF("src", "dst"), "src", "dst",
        seeds.toDF("s"), "s", rounds)
      .as[(Long, Long)].collect().toMap

  test("path graph: exact hop distances; nodes beyond the round horizon are absent") {
    // 0-1-2-3-4 chain from seed 0: after 3 rounds node 4 (dist 4) is
    // NOT yet final — it must be absent, not wrong.
    val chain = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    assert(dists(chain, Seq(0L), rounds = 3) ==
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
    assert(dists(chain, Seq(0L), rounds = 4)(4L) == 4L)
  }

  test("multi-source: each node takes the min over seeds; edges are undirected") {
    // seeds {0, 4} on the chain: middle node 2 is 2 from both; node 3
    // is 1 from seed 4 (via the reversed edge — symmetrization).
    val chain = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    assert(dists(chain, Seq(0L, 4L), rounds = 2) ==
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 0L))
  }

  test("normalization: duplicate/reversed edges and self-loops don't change distances; isolated seeds keep dist 0") {
    val messy = Seq((0L, 1L), (1L, 0L), (0L, 1L), (1L, 1L))
    // seed 7 touches no edge: it still reports dist 0 (a curated seed
    // remains trusted even when unlinked).
    assert(dists(messy, Seq(0L, 7L), rounds = 2) ==
      Map(0L -> 0L, 1L -> 1L, 7L -> 0L))
  }
}
