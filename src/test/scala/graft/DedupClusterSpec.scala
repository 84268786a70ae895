package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

/** Connected-components correctness on planted graphs, and the
  * LSH-bucket cluster pipeline against a naive transitive closure. */
class DedupClusterSpec extends SparkSpec {
  import spark.implicits._

  /** Runs BOTH the single-task union-find fast path (default
    * threshold) and the distributed star algorithm (threshold 0),
    * asserts they agree, returns the result. */
  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val df = edges.toDF("a", "b")
    val local = Dedup.connectedComponents(df, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.connectedComponents(df, "a", "b", localEdgeThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == dist, "local union-find and star rounds must agree")
    local
  }

  test("chain, clique, and singleton components all root at the minimum") {
    // components: {1,2,3} (chain), {10,11,12} (triangle), {20,21}
    val got = cc(Seq((3L, 2L), (2L, 1L), (10L, 11L), (11L, 12L),
      (12L, 10L), (21L, 20L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("self-loops and duplicate/reversed edges are tolerated") {
    val got = cc(Seq((5L, 5L), (1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L)))
    // the pure self-loop node disappears (no real edge)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("a 64-node path converges within the round budget (O(log n), not O(diameter))") {
    val path = (1L until 64L).map(i => (i, i + 1))
    val got = cc(path)
    assert(got.size == 64 && got.values.forall(_ == 1L))
  }

  test("empty edge list yields an empty result") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Dedup.connectedComponents(empty, "a", "b").isEmpty)
  }

  test("LSH bucket clusters agree with naive transitive closure of bucket co-membership") {
    val gramArrs = TextAnalysis.gramArrays(
      graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents"),
      "doc_id", "text", 5)
    val edges = Dedup.lshBucketEdges(gramArrs, "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val got = Dedup.connectedComponents(
      edges.toSeq.toDF("doc_a", "doc_b"), "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver-side union-find reference over the same edges
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(k => k -> find(k)).toMap
    assert(edges.nonEmpty, "fixture should produce at least one bucket edge")
    assert(got == want)
  }
}
