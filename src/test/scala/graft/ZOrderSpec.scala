package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.ZOrder
import graft.operators.Layout

/** Z-order clustering: bit-interleave correctness against a reference
  * implementation, and the property the layout exists for — files
  * written in curve order have small per-file bounding boxes in BOTH
  * dimensions, so a single-dimension range predicate prunes most of a
  * z-ordered table but NONE of a table sorted on the other column.
  */
class ZOrderSpec extends SparkSpec {

  private def refZ(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 31) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zValue matches the bit-by-bit reference on deterministic pseudo-random inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(500)((rnd.nextLong(1L << 31), rnd.nextLong(1L << 31))) ++
      Seq((0L, 0L), ((1L << 31) - 1, (1L << 31) - 1), (0L, (1L << 31) - 1))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == refZ(x, y), s"($x, $y)")
      assert(z >= 0L, s"z must stay positive, got $z for ($x, $y)")
    }
  }

  test("zValue pre-masks out-of-contract inputs to [0, 2^31) — same as the oracle") {
    import spark.implicits._
    // negative / too-wide inputs must degrade exactly like the DuckDB
    // expression (mask then interleave), never to a negative z-value
    val pts = Seq((-1L, 5L), (1L << 40, 3L), (Long.MinValue, Long.MaxValue))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == refZ(x & 0x7FFFFFFFL, y & 0x7FFFFFFFL), s"($x, $y)")
      assert(z >= 0L)
    }
  }

  test("zorderLayout on an empty input returns it unchanged (no NPE)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("x", "y")
    assert(Layout.zorderLayout(empty, "x", "y", 4).count() == 0)
  }

  private def refZ3(x: Long, y: Long, t: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 21) {
      z |= ((x >> i) & 1L) << (3 * i)
      z |= ((y >> i) & 1L) << (3 * i + 1)
      z |= ((t >> i) & 1L) << (3 * i + 2)
      i += 1
    }
    z
  }

  test("zValue3 matches the bit-by-bit 3-D reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val pts = Seq.fill(300)((rnd.nextLong(1L << 21), rnd.nextLong(1L << 21),
      rnd.nextLong(1L << 21))) ++
      Seq((0L, 0L, 0L), ((1L << 21) - 1, (1L << 21) - 1, (1L << 21) - 1))
    val got = pts.toDF("x", "y", "t")
      .select(col("x"), col("y"), col("t"),
        ZOrder.zValue3(col("x"), col("y"), col("t")).as("z"))
      .as[(Long, Long, Long, Long)].collect()
    got.foreach { case (x, y, t, z) =>
      assert(z == refZ3(x, y, t), s"($x, $y, $t)")
      assert(z >= 0L)
    }
  }

  test("z-value ordering is curve ordering (interleave preserves quadrant order)") {
    // points in quadrant (0,0) sort before (1,0)-quadrant x-major bit,
    // which sorts before anything with the y-major bit set
    val lowBoth = refZ(100, 200)
    val highX = refZ((1L << 30) + 5, 200)
    val highY = refZ(100, (1L << 30) + 5)
    assert(lowBoth < highX && highX < highY)
  }

  private def fileBoxes(dir: String, xCol: String, yCol: String): Seq[(Long, Long, Long, Long)] = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).toSeq
    files.map { f =>
      val Array(r: Row) = spark.read.parquet(f)
        .agg(min(col(xCol)), max(col(xCol)), min(col(yCol)), max(col(yCol)))
        .collect()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
  }

  test("z-ordered files prune a single-dimension predicate that a linear sort cannot") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val n = 1 << 14
    val df = Seq.fill(n)((rnd.nextLong(1L << 20), rnd.nextLong(1L << 20)))
      .toDF("x", "y")

    val base = Files.createTempDirectory("zorder").toString
    val zDir = s"$base/z"
    val linDir = s"$base/lin"
    val nFiles = 16
    Layout.zorderLayout(df, "x", "y", nFiles).write.parquet(zDir)
    df.repartitionByRange(nFiles, col("x")).sortWithinPartitions("x")
      .write.parquet(linDir)

    // predicate on y ALONE: y in a 1/8-of-domain band. A file can be
    // skipped iff its y min/max misses the band.
    val (lo, hi) = (1L << 17, (1L << 17) + (1L << 17))
    def hits(boxes: Seq[(Long, Long, Long, Long)]): Int =
      boxes.count { case (_, _, yMin, yMax) => yMax >= lo && yMin <= hi }

    val zBoxes = fileBoxes(zDir, "x", "y")
    val linBoxes = fileBoxes(linDir, "x", "y")
    assert(zBoxes.size == nFiles && linBoxes.size == nFiles)

    // x-sorted layout: every file's y-span covers ~the whole domain →
    // zero skipping on a y predicate
    assert(hits(linBoxes) == nFiles, s"linear: ${hits(linBoxes)}")
    // z-ordered layout: 16 curve segments ≈ the 4x4 quadrant grid;
    // a 1/8 y-band intersects at most 2 of 4 y-quarters → ≤ 8 files
    assert(hits(zBoxes) <= nFiles / 2, s"zorder: ${hits(zBoxes)} of $nFiles")

    // and the layout is lossless: same multiset of rows back
    val round = spark.read.parquet(zDir).as[(Long, Long)].collect().sorted
    assert(round.toSeq == df.as[(Long, Long)].collect().sorted.toSeq)
  }
}
