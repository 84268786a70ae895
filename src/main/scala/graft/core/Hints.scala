package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Conditional broadcast hint for frames whose size is DATA-dependent.
  *
  * A forced `broadcast(df)` bypasses Spark's size check: correct for a
  * frame that is small BY CONSTRUCTION (a sketch, a k-row centroid
  * table, a dimension), but a trap for corpus-DERIVED frames — e.g. a
  * near-dup cluster membership list is a fraction of the corpus that
  * depends on how dirty the corpus is (20-50 % of a web crawl), and at
  * 100 TB the forced hint OOMs the driver collecting it.
  *
  * `broadcastIfSmall` makes the hint a decision, the same shape as
  * [[Spread.ifNarrow]]: consult the optimizer's size ESTIMATE
  * (driver-side plan stats — nothing executes) and attach the hint
  * only when the estimate fits under the session's
  * autoBroadcastJoinThreshold. Unknown or large estimates pass the
  * frame through unhinted, where AQE's runtime shuffle statistics
  * still convert the join to broadcast whenever the frame turns out
  * small — so the test-scale plan keeps its broadcast join while the
  * 100-TB plan degrades safely to a shuffle join instead of an OOM.
  */
object Hints {
  def broadcastIfSmall(df: DataFrame): DataFrame = {
    val threshold =
      df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    if (threshold > 0 &&
        df.queryExecution.optimizedPlan.stats.sizeInBytes <= threshold)
      broadcast(df)
    else df
  }

  /** `df.graftBcastIfSmall()` sugar so call sites read like the built-in. */
  implicit class HintOps(private val df: DataFrame) extends AnyVal {
    def graftBcastIfSmall(): DataFrame = Hints.broadcastIfSmall(df)
  }
}
