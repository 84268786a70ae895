package graft

import graft.functions.Hilbert
import org.apache.spark.sql.functions._

/** Pins the Hilbert mapping's defining properties (bijectivity over
  * the full grid, consecutive-distance = grid neighbors) and that the
  * column form evaluates identically to the static method. */
class HilbertSpec extends SparkSpec {

  test("bijective and neighbor-continuous for orders 1..5") {
    for (order <- 1 to 5) {
      val n = 1 << order
      val m = (for (x <- 0 until n; y <- 0 until n)
        yield Hilbert.hilbertD(x, y, order) -> ((x, y))).toMap
      assert(m.size == n * n)
      assert(m.keys.min == 0L && m.keys.max == (n.toLong * n - 1))
      for (d <- 0L until (n.toLong * n - 1)) {
        val (x1, y1) = m(d); val (x2, y2) = m(d + 1)
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
          s"order $order: jump at d=$d")
      }
    }
  }

  test("curve-range bounding boxes are tighter than Morton's") {
    // the property file pruning actually buys: split the curve into
    // equal contiguous ranges ("files") and sum the ranges' 2-D
    // bounding-box areas — smaller total = tighter min/max stats =
    // more files pruned per range predicate
    val order = 6
    val n = 1 << order
    val cells = for (x <- 0 until n; y <- 0 until n) yield (x, y)
    def bboxSum(key: (Int, Int) => Long, nFiles: Int = 48): Long = {
      val per = cells.size / nFiles
      cells.sortBy { case (x, y) => key(x, y) }
        .grouped(per).take(nFiles).map { chunk =>
          val xs = chunk.map(_._1); val ys = chunk.map(_._2)
          (xs.max - xs.min + 1).toLong * (ys.max - ys.min + 1)
        }.sum
    }
    val h = bboxSum((x, y) => Hilbert.hilbertD(x, y, order))
    val m = bboxSum(graftZ)
    assert(h < m, s"hilbert bbox total $h vs morton $m")
  }

  private def graftZ(x: Int, y: Int): Long = {
    var z = 0L
    for (b <- 0 until 16) {
      z |= ((x.toLong >> b) & 1L) << (2 * b)
      z |= ((y.toLong >> b) & 1L) << (2 * b + 1)
    }
    z
  }

  test("column form matches the static method through codegen") {
    import spark.implicits._
    val rows = (0 until 500).map(i => (i.toLong * 7919 % 100003, i.toLong * 104729 % 99991))
    val bad = rows.toDF("x", "y")
      .select(col("x"), col("y"), Hilbert.hilbert(col("x"), col("y"), 31).as("d"))
      .as[(Long, Long, Long)].collect()
      .filter { case (x, y, d) => Hilbert.hilbertD(x, y, 31) != d }
    assert(bad.isEmpty)
  }
}
