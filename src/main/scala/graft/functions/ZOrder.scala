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

  /** The z-value of (x, y): x's bits on even positions, y's on odd. */
  def zValue(x: Column, y: Column): Column =
    spread(x.cast("long")).bitwiseOR(shiftleft(spread(y.cast("long")), 1))

  /** The same computation as DuckDB SQL over two BIGINT expressions. */
  def duckDbSql(x: String, y: String): String = {
    def spreadSql(e: String): String =
      masks.foldLeft(e) { case (acc, (sh, m)) =>
        s"((($acc) | (($acc) << $sh)) & $m)"
      }
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"
  }
}
