package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Generate
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
  *
  * ESTIMATE-QUALITY CONTRACT (why the gate must be conservative): a
  * broadcast hint, once attached, is NOT revocable at runtime — Spark's
  * join selection honors an explicit BROADCAST hint even when the
  * frame turns out larger than the threshold (the documented
  * may-cause-OOM behavior; AQE's DynamicJoinSelection only demotes
  * joins it chose itself, never a user hint). So an UNDER-estimate is
  * the dangerous direction. Without CBO, size-only propagation
  * over-estimates (joins multiply, aggregates/localCheckpoints report
  * unknown → defaultSizeInBytes) far more often than it
  * under-estimates — over-estimates merely skip the hint and let AQE
  * decide, which is safe. The one reachable under-estimate is a
  * `Generate` (explode/posexplode/inline): size-only stats carry the
  * PRE-explode child size, blind to multiplicity, so a 1 KB frame
  * exploding 10⁶-wide estimates as 1 KB. The gate therefore refuses
  * to hint any plan containing a Generate, regardless of estimate —
  * those frames fall through to AQE like the unknown-size case.
  * `HintsSpec` pins all four behaviors (small→hint, large→no hint,
  * generate→no hint, real q_dedup_keep drop list→AQE still
  * broadcasts at runtime).
  */
object Hints {
  def broadcastIfSmall(df: DataFrame): DataFrame = {
    val threshold =
      df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    val plan = df.queryExecution.optimizedPlan
    val underEstimateRisk = plan.exists(_.isInstanceOf[Generate])
    if (threshold > 0 && !underEstimateRisk &&
        plan.stats.sizeInBytes <= threshold)
      broadcast(df)
    else df
  }

  /** `df.graftBcastIfSmall()` sugar so call sites read like the built-in. */
  implicit class HintOps(private val df: DataFrame) extends AnyVal {
    def graftBcastIfSmall(): DataFrame = Hints.broadcastIfSmall(df)
  }
}
