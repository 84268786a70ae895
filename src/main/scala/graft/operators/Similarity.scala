package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Brute-force cosine top-k is the exact baseline (a broadcast of the
  * probe set against the full corpus — one pass, no index). The scale
  * path is random-hyperplane LSH: 16 deterministic hyperplanes hash
  * each vector to a 16-bit bucket; probes only compare within their
  * bucket (multi-probe over Hamming-adjacent buckets would raise
  * recall). All arithmetic is double-precision `aggregate`/`zip_with`
  * column expressions — no UDFs, fully codegen'd.
  */
object Similarity {

  /** Sequential-fold dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = aggregate(a, lit(0.0), (acc, x) => acc + x * x)

  /** Cosine similarity, computed as dot/sqrt(|a|²·|b|²) — fused into a
    * single codegen'd pass (see [[graft.functions.CosineSimExpr]];
    * numerically identical to the composed column form). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimExpr.cosineSim(a, b)

  /** Exact top-k cosine neighbors of each probe vector.
    *
    * @param probes  (qid, vec: array<double>)
    * @param corpus  (nid, vec: array<double>)
    * @return (qid, rank, nid, cos) — rank by (rounded cos desc, nid),
    *         self-matches excluded
    */
  def bruteForceTopK(probes: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = probes.select(col("qid"), col("vec").as("__qv"))
      .crossJoin(broadcast(corpus.select(col("nid"), col("vec").as("__nv"))))
      .where(col("qid") =!= col("nid"))
      // round to 6 decimals: the last-ulp of a double cosine differs
      // between engines/accumulation orders; ranking on the rounded
      // value with an id tiebreak is deterministic everywhere.
      .withColumn("cos", round(cosine(col("__qv"), col("__nv")), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    joined.withColumn("rank", row_number().over(w).cast(LongType))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("cos"))
  }

  /** All pairs with cosine ≥ tau (near-duplicate detection by
    * embedding). Exact — O(n²) dot products; the LSH bucket variant
    * below is the scale path. */
  def cosinePairs(corpus: DataFrame, tau: Double): DataFrame = {
    val a = corpus.select(col("nid").as("id_a"), col("vec").as("__va"))
    val b = corpus.select(col("nid").as("id_b"), col("vec").as("__vb"))
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .withColumn("cos", round(cosine(col("__va"), col("__vb")), 6))
      .where(col("cos") >= tau)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** IVF (inverted-file) approximate top-k: assign every corpus vector
    * to its nearest of `nLists` centroids (one partition pass), then
    * search each probe only in the `nProbe` centroid cells nearest to
    * it. Centroids are taken deterministically as the first `nLists`
    * corpus vectors (a k-means iteration would refine them — the
    * assignment/probing plumbing is identical). Cell assignment is a
    * broadcast of the centroid set; the probe-cell join is a keyed
    * equijoin — no cross join anywhere, the second 100 TB-scale path
    * besides LSH.
    */
  def ivfTopK(
      probes: DataFrame, // (qid, vec)
      corpus: DataFrame, // (nid, vec)
      k: Int,
      nLists: Int = 16,
      nProbe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // The centroid set is tiny (nLists rows) — collect it and inline
    // each centroid as a literal vector, so cell assignment over the
    // full corpus is a pure codegen map expression: argmax of nLists
    // cosines per row, no crossJoin and no per-vector window shuffle.
    val cents: Array[(Long, Seq[Double])] =
      corpus.orderBy(col("nid")).limit(nLists)
        .select(col("nid").cast(LongType), col("vec"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    if (cents.isEmpty)
      return probes.select(col("qid"), lit(0L).as("rank"),
        col("qid").as("nid"), lit(0.0).as("cos")).limit(0)
    // Struct ordering (d desc, cid asc) via lexicographic (d, -cid).
    def cellRank(vec: Column): Column = array(cents.map { case (cid, cv) =>
      struct(cosine(vec, typedlit(cv)).as("d"),
        lit(-cid).as("nc"), lit(cid).as("cid"))
    }: _*)
    val assigned = corpus
      .withColumn("cid", array_max(cellRank(col("vec"))).getField("cid"))
      .select(col("nid"), col("vec").as("__nv"), col("cid"))
    // nProbe nearest cells per probe (probe side is tiny)
    val probeCells = probes
      .withColumn("__cell",
        explode(slice(reverse(array_sort(cellRank(col("vec")))), 1, nProbe)))
      .select(col("qid"), col("vec").as("__qv"),
        col("__cell").getField("cid").as("cid"))
    // Each corpus vector lives in exactly one cell and probe cells are
    // distinct, so (qid, nid) appears at most once — no dedup needed.
    // Broadcasting the probe side keeps the 16-key cid join shuffle-free.
    val joined = assigned.join(broadcast(probeCells), Seq("cid"))
      .where(col("qid") =!= col("nid"))
      .withColumn("cos", round(cosine(col("__qv"), col("__nv")), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    joined.withColumn("rank", row_number().over(w).cast(LongType))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("cos"))
  }

  /** Deterministic pseudo-random hyperplanes: component d of plane m is
    * ±1 by the parity of a xorshift of (m * dim + d). */
  def planeSign(m: Int, d: Int): Double = {
    var x = (m.toLong * 1048573L + d.toLong * 31L + 1013904223L)
    x ^= x << 13; x ^= x >>> 7; x ^= x << 17
    if ((x & 1L) == 0L) 1.0 else -1.0
  }

  /** 16-bit LSH bucket id from random-hyperplane signs. */
  def lshBucket(vec: Column, dim: Int, numPlanes: Int = 16): Column = {
    val bits = (0 until numPlanes).map { m =>
      val plane = array((0 until dim).map(d => lit(planeSign(m, d))): _*)
      when(dot(vec, plane) >= 0, lit(1L << m)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Approximate top-k: probes compare only against corpus vectors in
    * the same hyperplane bucket — a bounded, shuffle-keyed join instead
    * of a cross join; the 100 TB-scale path. With `multiProbe`, each
    * probe additionally visits every Hamming-1-adjacent bucket (flip
    * one hyperplane sign), raising recall sharply for vectors near a
    * plane at the cost of (numPlanes+1)× probe rows — probes are the
    * tiny side, so the join stays corpus-size-bounded. */
  def lshTopK(probes: DataFrame, corpus: DataFrame, dim: Int, k: Int,
      numPlanes: Int = 16, multiProbe: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pb0 = probes.withColumn("__b0", lshBucket(col("vec"), dim, numPlanes))
    val pb = (if (multiProbe) {
      val flips = lit(0L) +: (0 until numPlanes).map(m => lit(1L << m))
      pb0.select(col("qid"), col("vec"),
          explode(array(flips.map(f => col("__b0").bitwiseXOR(f)): _*)).as("__bucket"))
    } else pb0.withColumnRenamed("__b0", "__bucket"))
      .select(col("qid"), col("__bucket"), col("vec").as("__qv"))
    val cb = corpus.withColumn("__bucket", lshBucket(col("vec"), dim, numPlanes))
      .select(col("nid"), col("__bucket"), col("vec").as("__nv"))
    val joined = pb.join(cb, "__bucket").where(col("qid") =!= col("nid"))
      .dropDuplicates("qid", "nid")
      .withColumn("cos", round(cosine(col("__qv"), col("__nv")), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    joined.withColumn("rank", row_number().over(w).cast(LongType))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("cos"))
  }
}
