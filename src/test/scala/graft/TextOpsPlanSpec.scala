package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.queries.Registry

/** Scale-shape assertions for the round-4 text/statistics operators:
  * TF-IDF must not plan a nested-loop product for the corpus-size
  * factor (a 1-row broadcast is the only acceptable product), the
  * quantile query must be a single aggregation exchange, and no
  * registered query anywhere may plan a CartesianProduct.
  */
class TextOpsPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def withoutAqe[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("tfidf joins document frequencies keyed and broadcasts only the 1-row corpus count") {
    withoutAqe {
      val p = Registry.all("q_tfidf").build(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"no cartesian product:\n$p")
      // the N factor rides a broadcast nested loop of a 1-row aggregate —
      // assert it broadcasts (BuildRight/Left of BroadcastExchange), and
      // that the term-df join itself is a hash join, not a product
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
        s"corpus count must broadcast:\n$p")
      assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
        s"df join must be keyed:\n$p")
    }
  }

  test("grouped quantiles plan exactly one aggregation exchange (map-side partials)") {
    withoutAqe {
      val plan = Registry.all("q_quantiles").build(spark, dir)
        .queryExecution.executedPlan
      val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
      // one exchange for groupBy(l_returnflag); the orderBy adds a range
      // exchange — nothing else may shuffle
      assert(shuffles.size <= 2,
        s"expected ≤2 exchanges (agg + sort), got ${shuffles.size}:\n$plan")
    }
  }
}
