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

  test("mixture weights: sum to ~1, monotone in group size, broadcast normalizer") {
    withoutAqe {
      val w = TrainingData.mixtureWeights(
        graft.core.Tables.load(spark, dir, "documents"), "source", alpha = 0.5)
      val p = plan(w).toString
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
        s"the 1-row normalizer must broadcast:\n$p")
      val rows = w.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(rows.length > 1)
      val s = rows.map(_._3).sum
      assert(math.abs(s - 1.0) < 1e-4, s"weights sum to $s")
      // alpha < 1 compresses: a group with more docs never gets a
      // smaller weight, and weight ratios are sub-linear in count ratios
      val sorted = rows.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, n1, w1), (_, n2, w2)) =>
          assert(n1 > 0 && n2 >= n1 && w2 >= w1 - 1e-9)
        case _ =>
      }
    }
  }

  test("dup coverage bounds the planted near-duplicates from below") {
    // A doc in a Jaccard ≥ τ pair shares i grams with its partner and
    // i/n_own ≥ i/(n_own + n_other - i) = J ≥ τ, so its dup_frac must
    // be at least τ — the coverage metric must agree with the dedup
    // family on the planted near-dups.
    val cov = Registry.all("q_dup_coverage").build(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val nearDup = Registry.all("q_dedup_ngram").build(spark, dir).collect()
    assert(nearDup.nonEmpty, "the fixture plants near-duplicate pairs")
    nearDup.foreach { r =>
      val (a, b, j) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(cov(a) >= j - 1e-6 && cov(b) >= j - 1e-6,
        s"pair ($a,$b) J=$j but coverage ${cov(a)}/${cov(b)}")
    }
    // and the metric is non-trivial: background word-soup docs are not
    // all flagged as fully duplicated
    assert(cov.values.exists(_ < 0.999), "coverage must discriminate")
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
