package graft

import graft.operators.GraphOps

/** Fixed-round k-core peeling (`GraphOps.kCore`): closed-form cores,
  * the multi-round cascade that single-shot degree filtering misses,
  * input normalization, and convergence to the true (unique) k-core.
  */
class KCoreSpec extends SparkSpec {

  import spark.implicits._

  private def core(edges: Seq[(Long, Long)], k: Int,
      rounds: Int): Map[Long, Long] =
    GraphOps.kCore(edges.toDF("src", "dst"), "src", "dst", k, rounds)
      .as[(Long, Long)].collect().toMap

  test("K4 with a pendant chain: the 3-core is exactly the clique") {
    // 4-clique {0,1,2,3} (every node degree 3) + chain 3-4-5. Round 1
    // drops 5 (deg 1) and 4 (deg 2); the clique survives with its
    // within-core degrees intact.
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val g = k4 ++ Seq((3L, 4L), (4L, 5L))
    assert(core(g, k = 3, rounds = 2) ==
      Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("peeling cascades: a node above k falls once its support peels") {
    // Chain 0-1-2-...-5 under k=2: endpoints peel first, then the
    // next-in, until nothing remains — a single-shot degree>=2 filter
    // would keep the whole interior. 3 rounds clear the 6-chain.
    val chain = (0L to 4L).map(i => (i, i + 1))
    assert(core(chain, k = 2, rounds = 3).isEmpty)
    // and the same chain CLOSED into a cycle is its own 2-core
    val cycle = chain :+ (5L, 0L)
    assert(core(cycle, k = 2, rounds = 3) ==
      (0L to 5L).map(_ -> 2L).toMap)
  }

  test("direction, duplicates and self-loops normalize away") {
    // triangle {1,2,3} written messily is a 2-core of degree 2 each
    val messy = Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 2L),
      (3L, 1L), (1L, 1L), (2L, 2L))
    assert(core(messy, k = 2, rounds = 2) ==
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("converged rounds are a fixpoint: extra rounds change nothing") {
    // two 4-cliques sharing node 0, plus a star at 9: the 3-core is
    // both cliques; once reached, more rounds must be a no-op.
    val c1 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val c2base = Seq(0L, 4L, 5L, 6L)
    val c2 = for (i <- 0 to 3; j <- (i + 1) to 3)
      yield (c2base(i), c2base(j))
    val g = c1 ++ c2 ++ Seq((9L, 0L), (9L, 1L))
    val r2 = core(g, k = 3, rounds = 2)
    val r5 = core(g, k = 3, rounds = 5)
    assert(r2 == r5)
    assert(r2.keySet == Set(0L, 1L, 2L, 3L, 4L, 5L, 6L))
    assert(r2(0L) == 6L) // the shared node keeps both cliques
  }
}
