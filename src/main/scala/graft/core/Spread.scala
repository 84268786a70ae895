package graft.core

import org.apache.spark.sql.DataFrame

/** Conditional parallelism spread for scan-stage inputs.
  *
  * At test scale a dimension-sized table is often ONE parquet split,
  * and any expensive per-row projection downstream (regex extraction,
  * tokenization, variant explosion) then runs in a single task — a
  * measured 3–6 s stall class at sf0.1. The historical fix was an
  * unconditional `repartition(defaultParallelism)`, but `repartition`
  * ALWAYS inserts a round-robin Exchange: at 100 TB that is a full
  * shuffle of the raw corpus before tokenization — likely the largest
  * single I/O in the query, paid for nothing because a 100 TB scan
  * already yields tens of thousands of splits.
  *
  * `ifNarrow` makes the spread an actual decision: it inspects the
  * PLANNED partition count of the input (driver-side only — building
  * the scan RDD lineage never launches a job) and repartitions only
  * when the scan is narrower than the session's parallelism. Wide
  * scans pass through untouched, so the 100-TB plan pays zero
  * round-robin Exchanges while the single-split test fix is kept.
  *
  * Contract: call on exchange-free batch inputs (a scan, optionally
  * with projections/filters). All call sites in this repo are raw
  * table scans. Under AQE a scan-only plan finalizes without
  * materializing any query stage, so the partition probe stays a
  * driver-side metadata walk.
  */
object Spread {
  def ifNarrow(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    // Planned (not executed) partition count of the scan. toRdd builds
    // the physical RDD graph; with no upstream Exchange nothing runs.
    val planned = df.queryExecution.toRdd.getNumPartitions
    if (planned >= p) df else df.repartition(p)
  }

  /** `df.graftSpread()` sugar so call sites read like the built-in. */
  implicit class SpreadOps(private val df: DataFrame) extends AnyVal {
    def graftSpread(): DataFrame = Spread.ifNarrow(df)
  }
}
