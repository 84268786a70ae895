package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.TrainingData

/** Properties of hierarchical (two-level) packing
  * ([[TrainingData.packBinsHier]]) — the scale-safe variant of
  * [[TrainingData.packBins]] whose window partitions are bounded by
  * the chunk size instead of spanning a whole group:
  *
  *  1. deterministic: the (doc → bin) mapping is a pure function of
  *     the data, independent of input partitioning;
  *  2. bins never span chunks;
  *  3. capacity-bounded: every doc STARTS within `capacity` tokens of
  *     its bin's start (the concat-and-chunk contract — a doc may
  *     straddle the bin end, exactly like [[TrainingData.packBins]]);
  *  4. per-chunk agreement with exact packing: inside one chunk the
  *     grouping equals [[TrainingData.packBins]] run on that chunk's
  *     docs alone, bin ids shifted by the chunk's global offset — and
  *     with a chunk large enough to hold everything, the two operators
  *     agree exactly.
  */
class PackHierSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("src", StringType),
    StructField("id", LongType),
    StructField("tok", LongType)))

  /** Deterministic synthetic corpus: two skewed sources, varying doc
    * lengths, ids interleaved across sources. */
  private def corpus(n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      Row(if (i % 3 == 0) "small" else "big", i.toLong,
        (i * 37 % 91 + 5).toLong)
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  private def hier(df: DataFrame, capacity: Long, chunk: Long): DataFrame =
    TrainingData.packBinsHier(df, "src", "id", col("tok"), capacity, chunk)

  private def binsOf(df: DataFrame): Map[(String, Long), Long] =
    df.collect().map(r => (r.getAs[String]("src"), r.getAs[Long]("id")) ->
      r.getAs[Long]("bin")).toMap

  test("deterministic under arbitrary input partitioning") {
    val base = corpus(500)
    val a = binsOf(hier(base, 64L, 100L))
    val b = binsOf(hier(base.repartition(7), 64L, 100L))
    val c = binsOf(hier(base.orderBy(desc("id")).repartition(3), 64L, 100L))
    assert(a == b && a == c)
    assert(a.size == 500)
  }

  test("bins never span chunks and docs start within capacity of their bin start") {
    val out = hier(corpus(500), 64L, 100L).cache()
    try {
      // one chunk per bin
      val spanning = out.withColumn("chunk", expr("id div 100"))
        .groupBy("src", "bin")
        .agg(countDistinct("chunk").as("nchunks"))
        .where(col("nchunks") > 1)
      assert(spanning.count() == 0, "a bin crossed a chunk boundary")
      // bin-local start offset of every doc < capacity
      val w = Window.partitionBy("src", "bin").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val bad = out
        .withColumn("start", sum(col("n_tokens")).over(w) - col("n_tokens"))
        .where(col("start") >= 64L)
      assert(bad.count() == 0, "a doc started beyond the bin capacity")
    } finally out.unpersist()
  }

  test("agrees with exact packBins inside each chunk (up to the chunk's bin offset)") {
    val base = corpus(500)
    val out = hier(base, 64L, 100L)
      .withColumn("chunk", expr("id div 100")).cache()
    try {
      val chunks = out.select("src", "chunk").distinct().collect()
        .map(r => (r.getString(0), r.getLong(1)))
      chunks.foreach { case (s, ch) =>
        val restricted = base.where(col("src") === s &&
          expr("id div 100") === ch)
        val exact = TrainingData
          .packBins(restricted, "src", "id", col("tok"), 64L)
          .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("bin")).toMap
        val local = out.where(col("src") === s && col("chunk") === ch)
          .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("bin")).toMap
        val offset = local.values.min
        assert(local.map { case (id, b) => id -> (b - offset) } == exact,
          s"chunk ($s, $ch) diverged from exact packing")
      }
    } finally out.unpersist()
  }

  test("one big chunk reproduces exact packBins verbatim") {
    val base = corpus(300)
    val exact = binsOf(
      TrainingData.packBins(base, "src", "id", col("tok"), 64L)
        .select("src", "id", "bin"))
    val one = binsOf(hier(base, 64L, 1000000L))
    assert(one == exact)
  }
}
