package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Centroid seeding on id-CORRELATED clustered input (the real-corpus
  * shape: a crawl ingests source-by-source, so consecutive ids are
  * semantically close). First-N-by-id seeding would take every seed
  * from the first cluster and collapse each remaining cluster into a
  * single hot cell; the hash-sampled seeding (Similarity.seedSample)
  * must spread seeds across clusters and keep cell sizes bounded, so
  * in-cell quadratic work (semDedup) cannot concentrate.
  */
class SeedSkewSpec extends SparkSpec {

  import spark.implicits._

  // 4 well-separated clusters x 64 vectors, ids SEQUENTIAL per cluster
  // (0-63 cluster 0, 64-127 cluster 1, ...) — dim-8 basis directions
  // plus small deterministic jitter.
  private def clustered = {
    val rows = for {
      id <- 0 until 256
      cluster = id / 64
    } yield {
      val vec = (0 until 8).map { d =>
        val base = if (d == cluster * 2) 1.0 else 0.0
        base + 0.01 * ((id * 7 + d * 3) % 13)
      }
      (id.toLong, vec)
    }
    rows.toDF("nid", "vec")
  }

  test("hash-sampled seeds span every id-contiguous cluster") {
    // kmeansRefine(iters=1) reports the seed-cell populations: cid is
    // the seed's nid, so cid/64 is the cluster the seed came from.
    val cells = Similarity.kmeansRefine(clustered, nLists = 16, iters = 1)
      .select(col("cid"), col("n_vecs")).distinct()
      .as[(Long, Long)].collect()
    val seedClusters = cells.map(_._1 / 64).toSet
    assert(seedClusters == Set(0L, 1L, 2L, 3L),
      s"seeds must cover all 4 clusters, got clusters $seedClusters")
    // Balance: with seeds inside every cluster, no cell may swallow a
    // whole 64-vector cluster (the first-N failure mode collapses each
    // unseeded cluster into one 64-vector cell). 48 tolerates a
    // cluster drawing only 2 seeds with jittered splits (measured max
    // 35 here) while still failing on any whole-cluster collapse.
    val maxCell = cells.map(_._2).max
    assert(maxCell <= 48, s"hot cell of $maxCell vectors — seeding skewed")
    assert(cells.map(_._2).sum == 256L)
  }
}
