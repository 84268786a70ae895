package graft

import graft.operators.GraphOps

/** Personalized PageRank (`GraphOps.personalizedPageRank`):
  * closed-form ranks on a star, zero mass for unreachable components,
  * and seed filtering against the graph's node set.
  */
class PprSpec extends SparkSpec {

  import spark.implicits._

  test("star from the seed: closed-form one-iteration ranks; unreachable component gets 0") {
    // component A: center 0 — leaves 1, 2 (symmetrized to both
    // directions so the undirected star matches q_ppr's convention);
    // component B: 3 — 4, unreachable from the seed.
    val b = Seq((0L, 1L), (0L, 2L), (3L, 4L))
    val e = (b ++ b.map(_.swap)).toDF("src", "dst")
    val got = GraphOps.personalizedPageRank(e, "src", "dst",
        Seq(0L).toDF("s"), "s", iters = 1)
      .as[(Long, Long)].collect().toMap
    val R = 1000000000000L
    // r0: seed = R, rest 0. Iter 1: seed = base (15% of R, ns=1) + 0
    // inbound; each leaf = 85% of (R / deg(0)=2); B-component = 0.
    assert(got == Map(
      0L -> (15L * R / 100L),
      1L -> (85L * (R / 2L) / 100L),
      2L -> (85L * (R / 2L) / 100L),
      3L -> 0L, 4L -> 0L))
  }

  test("seeds outside the graph are ignored; at least one real seed required") {
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    // seed 99 is not a node — filtered; seed 1 carries all the mass
    val got = GraphOps.personalizedPageRank(e, "src", "dst",
        Seq(1L, 99L).toDF("s"), "s", iters = 1)
      .as[(Long, Long)].collect().toMap
    val R = 1000000000000L
    assert(got(1L) == 15L * R / 100L)
    assert(got(2L) == 85L * R / 100L)
    intercept[IllegalArgumentException] {
      GraphOps.personalizedPageRank(e, "src", "dst",
        Seq(99L).toDF("s"), "s", iters = 1).collect()
    }
  }
}
