package graft

import org.apache.spark.sql.functions._

import graft.operators.GraphOps

/** Per-node triangle counting (`GraphOps.triangleCounts`): known
  * closed-form graphs, input normalization (direction, duplicates,
  * self-loops), and the degree-orientation invariance that makes the
  * lexicographic oracle valid.
  */
class TriangleSpec extends SparkSpec {

  import spark.implicits._

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] =
    GraphOps.triangleCounts(edges.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap

  test("K4: every node sits in C(3,2)=3 triangles; path graph has none") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    assert(counts(k4) == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    assert(counts(Seq((1L, 2L), (2L, 3L), (3L, 4L))).isEmpty)
  }

  test("direction, duplicate edges and self-loops normalize away") {
    // one triangle {1,2,3} written messily: reversed edges, dups, loops
    val messy = Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 2L),
      (3L, 1L), (1L, 1L), (2L, 2L))
    assert(counts(messy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("hub graph: a high-degree center with one closing rim edge") {
    // star center 0 with leaves 1..10, plus rim edge (1,2): exactly
    // one triangle {0,1,2} — the orientation must not lose it even
    // though the hub's undirected degree dwarfs everyone's
    val star = (1L to 10L).map(i => (0L, i)) :+ (1L, 2L)
    assert(counts(star) == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("two triangles sharing an edge count both corners correctly") {
    // {1,2,3} and {2,3,4} share edge (2,3)
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(counts(g) == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  private def lpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    GraphOps.labelPropagation(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(Long, Long)].collect().toMap

  test("label propagation: two cliques with one bridge settle into two communities") {
    val cliqueA = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val cliqueB = for (i <- 10L to 13L; j <- (i + 1) to 13L) yield (i, j)
    val g = cliqueA ++ cliqueB :+ (3L, 10L)
    val labels = lpa(g, 4)
    val aLbls = (0L to 3L).map(labels).toSet
    val bLbls = (10L to 13L).map(labels).toSet
    assert(aLbls.size == 1 && bLbls.size == 1,
      s"each clique must converge to one label: $labels")
    assert(aLbls != bLbls, s"the bridge must not merge the cliques: $labels")
  }

  test("label propagation round 1 is exact: min neighbor label everywhere on a path") {
    // one sync round from self-labels: every node takes its smallest
    // neighbor's id (all neighbor labels are distinct, tie-break = min)
    val labels = lpa(Seq((1L, 2L), (2L, 3L), (3L, 4L)), 1)
    assert(labels == Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }
}
