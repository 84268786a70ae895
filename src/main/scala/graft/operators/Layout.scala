package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ZOrder

/** Data-layout clustering: arrange rows so parquet min/max stats prune
  * multi-dimensional scans. At 100 TB the cheapest query is the one
  * whose files never open — a table z-ordered on its two hottest
  * filter columns answers range predicates on EITHER OR BOTH columns
  * from a small fraction of its files, where a single-column sort
  * prunes only its own column and leaves the other's per-file span at
  * ~the full domain.
  */
object Layout {

  /** Scales `c` (observed range [lo, hi]) to [0, 2^20) so dimensions
    * of wildly different magnitudes interleave fairly — without the
    * rescale, a 40-bit dimension's high bits would dominate every
    * comparison and the curve degenerates to a single-column sort. */
  private def scaled(c: Column, lo: Long, hi: Long): Column = {
    val span = hi - lo
    require(span >= 0, s"zorderLayout range overflowed a long: [$lo, $hi]")
    // shift, don't multiply-then-divide: (c - lo) * 2^20 overflows once
    // the observed span exceeds 2^43, and Column./ is FLOATING-POINT
    // division (loses exactness past 2^53). A right-shift by
    // bitlen(span) - 20 lands every offset in [0, 2^20) for ANY long
    // range, stays integer-exact, and codegens to one instruction
    // (narrow spans shift by 0 — raw offsets, already < 2^20).
    val shift = math.max(
      64 - java.lang.Long.numberOfLeadingZeros(span) - 20, 0)
    shiftright(c.cast("long") - lit(lo), shift)
  }

  /** Returns `df` re-arranged for a z-ordered write on (xCol, yCol):
    * range-partitioned into `nFiles` curve segments and sorted by the
    * z-value within each, so each written file covers one contiguous
    * curve stretch = one small (x, y) bounding box.
    *
    * The per-column min/max comes from one tiny aggregate (4 scalars
    * to the driver — layout metadata, not data; this is how engines
    * with an OPTIMIZE ZORDER command derive their range ids). The
    * rows themselves move in exactly ONE shuffle (the range
    * repartition); the within-partition sort spills, never buffers. */
  def zorderLayout(df: DataFrame, xCol: String, yCol: String,
      nFiles: Int): DataFrame = {
    val Array(r) = df.agg(
      min(col(xCol).cast("long")), max(col(xCol).cast("long")),
      min(col(yCol).cast("long")), max(col(yCol).cast("long"))).collect()
    // Empty input (or all-null layout columns): min/max aggregate to
    // null — nothing to lay out, return unchanged rather than NPE.
    if (r.isNullAt(0) || r.isNullAt(2)) return df
    val z = ZOrder.zValue(
      scaled(col(xCol), r.getLong(0), r.getLong(1)),
      scaled(col(yCol), r.getLong(2), r.getLong(3)))
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
