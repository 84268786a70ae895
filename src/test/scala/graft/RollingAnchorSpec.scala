package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{RollingAnchor, RollingAnchorRT}

/** The rolling anchor expression (q_span_dedup's scan): the rolled
  * hash must equal a from-scratch Horner evaluation at every position,
  * anchors must be ALIGNMENT-INVARIANT (the content-defined property
  * the operator exists for), and the expression must run inside
  * whole-stage codegen. */
class RollingAnchorSpec extends SparkSpec {

  private val B = 31L
  private val M = 1000000007L
  private def gear(b: Byte): Long = (b & 0xff).toLong * 2654435761L % 65536L

  /** Brute-force (non-rolling) reference: Horner over each gram. */
  private def bruteAnchors(bytes: Array[Byte], gram: Int, window: Int,
      classes: Int): Seq[Int] =
    (0 to bytes.length - window).filter { p =>
      val h = (p until p + gram).foldLeft(0L)((acc, i) => (acc * B + gear(bytes(i))) % M)
      h % classes == 0
    }

  private def rolled(s: String): Seq[Int] =
    RollingAnchorRT.anchors(s.getBytes("UTF-8"), 8, 40, 8)
      .toIntArray().toSeq

  test("rolled hash equals brute-force Horner on random strings") {
    val rnd = new scala.util.Random(42)
    (0 until 50).foreach { _ =>
      val len = rnd.nextInt(200)
      val s = (0 until len).map(_ => (rnd.nextInt(96) + 32).toChar).mkString
      val bytes = s.getBytes("UTF-8")
      assert(rolled(s) == bruteAnchors(bytes, 8, 40, 8),
        s"rolling/brute divergence on: ${s.take(80)}")
    }
  }

  test("anchors are alignment-invariant: a shared span anchors at the same content positions") {
    val rnd = new scala.util.Random(7)
    val span = (0 until 150).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    // plant the SAME span at very different offsets, different context
    val a = "x" * 3 + span + "y" * 50
    val b = "z" * 47 + span + "w" * 9
    def inSpan(text: String, off: Int): Seq[Int] =
      rolled(text).filter(p => p >= off + 7 && p + 40 <= off + span.length - 7)
        .map(_ - off)
    // positions ≥7 bytes inside the span depend only on span content
    val ia = inSpan(a, 3)
    val ib = inSpan(b, 47)
    assert(ia == ib, s"anchor positions shifted with alignment: $ia vs $ib")
    assert(ia.nonEmpty, "planted span produced no interior anchors")
  }

  test("short input (under one window) yields no anchors; empty input is safe") {
    assert(rolled("") == Seq.empty)
    assert(rolled("tiny") == Seq.empty)
    assert(rolled("a" * 39) == Seq.empty)
  }

  test("window < gram is rejected at construction; runtime path is array-safe") {
    // expression-level guard: the Column API constructs the case class,
    // whose require fires immediately
    intercept[IllegalArgumentException] {
      RollingAnchor.anchors(lit("abcdefgh").cast(BinaryType), 8, 4, 8)
    }
    // runtime guard independently: window <= n < gram used to drive the
    // init loop past the array (AIOOBE from generated code)
    assert(RollingAnchorRT.anchors("abcde".getBytes("UTF-8"), 8, 4, 8)
      .toIntArray().isEmpty)
  }

  test("expression evaluates identically via codegen and interpretation") {
    import spark.implicits._
    val texts = Seq("the quick brown fox " * 8, "a" * 100, "", "short")
      .toDF("text")
    val got = texts
      .select(RollingAnchor.anchors(col("text").cast(BinaryType), 8, 40, 8).as("a"))
      .collect().map(r => r.getAs[scala.collection.Seq[Int]]("a").toSeq)
    val expected = Seq("the quick brown fox " * 8, "a" * 100, "", "short")
      .map(s => rolled(s))
    assert(got.toSeq == expected)
    // whole-stage codegen must cover the projection (the expression
    // generates a static call, not a CodegenFallback) — over a range
    // scan, since a local relation is evaluated at planning time
    val ranged = spark.range(100)
      .select(RollingAnchor.anchors(
        concat(lit("the quick brown fox jumps over it all "),
          col("id").cast(StringType)).cast(BinaryType), 8, 40, 8).as("a"))
    val plan = ranged.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators inside a WholeStageCodegen span
    assert(plan.contains("*(1) Project"), s"projection not codegen'd:\n$plan")
    assert(ranged.selectExpr("sum(size(a))").collect().head.getLong(0) >= 0)
  }
}
