package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.operators.{TextAnalysis, TrainingData}
import graft.queries.Registry

/** Scale-shape assertions for the corpus-preparation operators: the
  * decontamination join must BROADCAST the (small) eval gram side —
  * the train corpus must never shuffle for the join — and sequence
  * packing must cost exactly one shuffle (the per-group window
  * partition), with the per-bin rollup riding the same partitioning.
  */
class TrainingDataPlanSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  private def withoutAqe[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def plan(df: org.apache.spark.sql.DataFrame): SparkPlan =
    df.queryExecution.executedPlan

  test("decontamination broadcasts the eval grams, never shuffles train grams") {
    withoutAqe {
      val p = plan(Registry.all("q_decontaminate").build(spark, dir)).toString
      assert(p.contains("BroadcastHashJoin"), s"expected a broadcast join:\n$p")
      assert(!p.contains("SortMergeJoin"),
        s"the gram join must not sort-merge (train side would shuffle):\n$p")
    }
  }

  test("packing plans one shuffle: the window partition carries the rollup") {
    withoutAqe {
      val packed = TrainingData.packBins(
        graft.core.Tables.load(spark, dir, "documents")
          .select(col("source"), col("doc_id"), col("text")),
        "source", "doc_id", size(TextAnalysis.tokens(col("text"))), 512L)
        .groupBy(col("source"), col("bin"))
        .agg(count(lit(1)).as("n_docs"))
      val shuffles = plan(packed).collect { case s: ShuffleExchangeExec => s }
      // one exchange for the window partitionBy(source); the
      // groupBy(source, bin) partial-aggregates on the same rows and
      // its final agg reuses the window's hash partitioning only if
      // compatible — allow it, but the WINDOW must not add a second
      // pre-shuffle sort pass of the raw corpus
      assert(shuffles.nonEmpty && shuffles.size <= 2,
        s"packing should shuffle at most twice (window + final agg), got ${shuffles.size}")
      assert(shuffles.exists(_.outputPartitioning.toString.contains("source")),
        "the window shuffle must partition by the group column")
    }
  }

  test("wordGrams matches a naive reference on planted token arrays") {
    val toks = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("x", "y")), // fewer than n tokens -> empty
      (3L, Seq("p", "q", "r"))).toDF("id", "toks")
    val got = toks.select(col("id"), TrainingData.wordGrams(col("toks"), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("a b c", "b c d"))
    assert(got(2L) == Seq.empty)
    assert(got(3L) == Seq("p q r"))
  }
}
