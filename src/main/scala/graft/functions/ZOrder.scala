package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve: interleaves the bits of two dimension
  * values into one long whose ordering is 2-D-local — rows close on
  * the curve are close in BOTH dimensions, so range-partitioning and
  * sorting by the z-value gives every output file a small bounding box
  * in (x, y) and parquet min/max stats prune multi-dimensional range
  * queries that a single-column sort can only prune on its own column.
  *
  * Built from plain `functions._` bit ops (shiftleft / bitwiseOR /
  * bitwiseAND) — five spread steps per dimension, all inside
  * whole-stage codegen; no UDF, no custom Expression needed. The same
  * expression is emitted as DuckDB SQL by [[duckDbSql]] so oracles
  * compare byte-exactly.
  *
  * Contract: each input must be in [0, 2³¹) — bit 30 is the highest
  * that interleaves (to position 62) while keeping the z-value a
  * POSITIVE signed long, so plain long ordering is curve ordering.
  * Scale or bucket wider/skewed domains first (see
  * `Layout.zorderLayout`, which normalizes by min/max).
  */
object ZOrder {

  private val masks = Seq(
    (16, 0x0000FFFF0000FFFFL),
    (8, 0x00FF00FF00FF00FFL),
    (4, 0x0F0F0F0F0F0F0F0FL),
    (2, 0x3333333333333333L),
    (1, 0x5555555555555555L))

  /** Spreads the low 32 bits of `c` to the even bit positions. */
  private def spread(c: Column): Column =
    masks.foldLeft(c) { case (acc, (sh, m)) =>
      acc.bitwiseOR(shiftleft(acc, sh)).bitwiseAND(lit(m))
    }

  /** The z-value of (x, y): x's bits on even positions, y's on odd.
    * Inputs pre-mask to the documented [0, 2³¹) domain (mirroring
    * spread3's 0x1FFFFF mask) so out-of-contract values degrade
    * identically to the DuckDB oracle expression instead of producing
    * negative z-values that break curve ordering. */
  def zValue(x: Column, y: Column): Column =
    spread(x.cast("long").bitwiseAND(lit(0x7FFFFFFFL)))
      .bitwiseOR(shiftleft(
        spread(y.cast("long").bitwiseAND(lit(0x7FFFFFFFL))), 1))

  /** The same computation as DuckDB SQL over two BIGINT expressions.
    * DuckDB's `<<` RAISES on signed overflow where Spark's shiftleft
    * wraps, so the shifted operand pre-masks to exactly the bits that
    * survive the post-shift mask — `(acc & (m >> sh)) << sh` — which
    * never leaves the positive range and changes nothing else. */
  def duckDbSql(x: String, y: String): String = {
    def spreadSql(e: String): String =
      masks.foldLeft(s"(($e) & ${0x7FFFFFFFL})") { case (acc, (sh, m)) =>
        s"((($acc) | ((($acc) & ${m >> sh}) << $sh)) & $m)"
      }
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"
  }

  /** 3-D Morton spread masks: every 3rd bit position, 21 bits per
    * dimension (3 × 21 = 63 — the z-value stays a positive long). */
  private val masks3 = Seq(
    (32, 0x001F00000000FFFFL),
    (16, 0x001F0000FF0000FFL),
    (8, 0x100F00F00F00F00FL),
    (4, 0x10C30C30C30C30C3L),
    (2, 0x1249249249249249L))

  private def spread3(c: Column): Column =
    masks3.foldLeft(c.bitwiseAND(lit(0x1FFFFFL))) { case (acc, (sh, m)) =>
      acc.bitwiseOR(shiftleft(acc, sh)).bitwiseAND(lit(m))
    }

  /** The z-value of (x, y, t) — the canonical third dimension is
    * event time bucketed to [0, 2²¹): range scans on ANY of the three
    * dimensions prune curve-sorted files. Each input must be in
    * [0, 2²¹); wider domains rescale first (Layout.zorderLayout's
    * shift normalization applies the same way). */
  def zValue3(x: Column, y: Column, t: Column): Column =
    spread3(x.cast("long"))
      .bitwiseOR(shiftleft(spread3(y.cast("long")), 1))
      .bitwiseOR(shiftleft(spread3(t.cast("long")), 2))

  /** zValue3 as DuckDB SQL over three BIGINT expressions (same
    * overflow-safe pre-mask as [[duckDbSql]]). */
  def duckDbSql3(x: String, y: String, t: String): String = {
    def spreadSql(e: String): String =
      masks3.foldLeft(s"(($e) & ${0x1FFFFFL})") { case (acc, (sh, m)) =>
        s"((($acc) | ((($acc) & ${m >> sh}) << $sh)) & $m)"
      }
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1) | (${spreadSql(t)} << 2))"
  }
}
