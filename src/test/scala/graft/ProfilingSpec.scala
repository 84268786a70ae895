package graft

import org.apache.spark.sql.functions._

import graft.operators.Profiling
import graft.operators.Profiling.{ColSpec, Num, Str}

/** One-pass table profiling (`Profiling.profile`): metric correctness
  * with planted nulls, and the property the operator exists for — the
  * whole profile (sketches included) reads the input exactly ONCE.
  */
class ProfilingSpec extends SparkSpec {

  private val specs = Seq(
    ColSpec("a", Num, distinct = true),
    ColSpec("s", Str, distinct = true))

  test("metrics: counts, nulls, min/max, sub-k distinct are exact; nulls excluded") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)](
      (1L, "xx"), (2L, "yyy"), (2L, null), (null, "z"), (4L, "xx"))
      .toDF("a", "s")
    val got = Profiling.profile(df, specs)
      .as[(String, String, Double)].collect()
      .map { case (c, m, v) => (s"$c.$m", v) }.toMap
    assert(got("_table_.rows") == 5.0)
    assert(got("a.count") == 4.0 && got("a.nulls") == 1.0)
    assert(got("a.min") == 1.0 && got("a.max") == 4.0)
    assert(got("a.distinct_kmv") == 3.0) // 1, 2, 4 — null excluded
    assert(got("s.count") == 4.0 && got("s.nulls") == 1.0)
    assert(got("s.min_len") == 1.0 && got("s.max_len") == 3.0)
    assert(got("s.distinct_kmv") == 3.0) // xx, yyy, z
  }

  test("a column name containing the reserved '~' separator fails loudly") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("a~b", "s")
    intercept[IllegalArgumentException] {
      Profiling.profile(df, Seq(ColSpec("a~b", Num)))
    }
    intercept[IllegalArgumentException] {
      Profiling.duckDbSql("t", Seq(ColSpec("a~b", Num)))
    }
  }

  test("mcv: top-k values by (freq desc, value asc), nulls excluded, one scan") {
    import spark.implicits._
    val df = Seq("b", "b", "a", "a", "c", null, "d")
      .zipWithIndex.map { case (s, i) => (s, (i % 3).toString) }
      .toDF("s", "g")
    val got = Profiling.mcv(df, Seq("s", "g"), 2)
      .as[(String, String, Long, Long)].collect().toSeq
    // s: a×2 and b×2 tie → value asc; g: "0"×3, then "1"×2
    assert(got == Seq(
      ("g", "0", 3L, 1L), ("g", "1", 2L, 2L),
      ("s", "a", 2L, 1L), ("s", "b", 2L, 2L)))
    val plan = Profiling.mcv(df, Seq("s", "g"), 2)
      .queryExecution.executedPlan.toString
    val scans = "LocalTableScan|Scan ExistingRDD".r.findAllIn(plan).size
    assert(scans == 1, s"expected one scan, plan:\n$plan")
  }

  test("the whole profile is ONE scan of the input") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, s"s$i")).toDF("a", "s")
    val plan = Profiling.profile(df, specs).queryExecution.executedPlan.toString
    val scans = "LocalTableScan|Scan ExistingRDD".r.findAllIn(plan).size
    assert(scans == 1, s"expected one scan, plan:\n$plan")
  }

  test("histogram: exact integer bins, ceiling width, nulls and empty bins absent") {
    import spark.implicits._
    // a: 0..9 over 4 bins → width (9-0+4) div 4 = 3: bins [0,2][3,5]
    // [6,8][9,11]; b: constant 7 with one null → width 1, one bin
    val df = ((0 to 9).map(i => (Some(i.toLong), Some(7L))) :+
      ((Some(0L): Option[Long], None: Option[Long]))).toDF("a", "b")
    val got = Profiling.histogram(df, Seq("a", "b"), 4)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("a", 0L, 0L, 2L, 4L),  // 0,1,2 plus the extra (0, null) row
      ("a", 1L, 3L, 5L, 3L),
      ("a", 2L, 6L, 8L, 3L),
      ("a", 3L, 9L, 11L, 1L),
      ("b", 0L, 7L, 7L, 10L)))
  }

  test("histogram: doubles floor before binning; empty input yields no rows, not an NPE") {
    import spark.implicits._
    // 2.9 floors to 2, not rounds to 3 — the cross-engine trap the
    // explicit floor exists for
    val df = Seq(0.1, 2.9).toDF("x")
    val got = Profiling.histogram(df, Seq("x"), 2)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    // min 0, max 2, width (2-0+2) div 2 = 2: bins [0,1] and [2,3]
    assert(got == Set(("x", 0L, 0L, 1L, 1L), ("x", 1L, 2L, 3L, 1L)))
    assert(Profiling.histogram(df.limit(0), Seq("x"), 2).count() == 0L)
  }

  test("corr: exact ±1 on linear columns, null on zero variance, pairwise-complete n") {
    import spark.implicits._
    // b = 2a (r=1), c = -a (r=-1), d constant (zero variance → null),
    // and one row where b is null — the (a,b) pair must count 3 rows
    // while (a,c) counts all 4.
    val df = Seq(
      (1.0, Some(2.0), -1.0, 5.0), (2.0, Some(4.0), -2.0, 5.0),
      (3.0, Some(6.0), -3.0, 5.0), (4.0, None, -4.0, 5.0))
      .toDF("a", "b", "c", "d")
    val got = Profiling.corr(df, Seq("a", "b", "c", "d"))
      .as[(String, String, Long, Option[Double])].collect()
      .map { case (x, y, n, r) => (x, y) -> ((n, r)) }.toMap
    assert(got(("a", "b")) == ((3L, Some(1.0))))
    assert(got(("a", "c")) == ((4L, Some(-1.0))))
    assert(got(("a", "d")) == ((4L, None)))
    assert(got(("b", "c")) == ((3L, Some(-1.0))))
    assert(got.size == 6)
  }

  test("equiDepthBoundaries: exact quartiles on uniform data, skew collapses boundaries") {
    import spark.implicits._
    val uni = (1L to 8L).toDF("x")
    val got = Profiling.equiDepthBoundaries(uni, Seq("x"), 4)
      .as[(String, Long, Long, Long)].collect().toSet
    // ranks ceil(b·8/4) = 2, 4, 6 → boundaries 2, 4, 6
    assert(got == Set(("x", 1L, 2L, 8L), ("x", 2L, 4L, 8L), ("x", 3L, 6L, 8L)))
    // heavy skew: 6×5 and 2×9 — every quartile rank lands inside the
    // hot value, so all three boundaries collapse onto it
    val skew = (Seq.fill(6)(5L) ++ Seq.fill(2)(9L)).toDF("x")
    val got2 = Profiling.equiDepthBoundaries(skew, Seq("x"), 4)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got2 == Set(("x", 1L, 5L, 8L), ("x", 2L, 5L, 8L), ("x", 3L, 5L, 8L)))
  }

  test("joinCardinality: exact = sum of frequency products; wide sketch is collision-free") {
    import spark.implicits._
    // A has key 1 ×2, key 2 ×1, key 3 ×1 (3 never joins); B has
    // 1 ×3, 2 ×2. Exact = 2·3 + 1·2 = 8. With 3 keys in a 65536-wide
    // sketch no buckets collide, so the estimate must equal exact.
    val a = Seq(1L, 1L, 2L, 3L).toDF("k")
    val b = Seq(1L, 1L, 1L, 2L, 2L).toDF("k")
    val got = Profiling.joinCardinality(a, "k", b, "k", width = 65536)
      .as[(Long, Long)].collect().head
    assert(got == ((8L, 8L)))
    // disjoint keys: exact 0; the estimate may exceed it (collisions
    // only ADD) but never goes below
    val c = Seq(99L).toDF("k")
    val (ex0, est0) = Profiling.joinCardinality(a, "k", c, "k", width = 4)
      .as[(Long, Long)].collect().head
    assert(ex0 == 0L && est0 >= 0L)
  }

  test("mutualInfo: 0 nats for independent columns, ln k for a bijection") {
    import spark.implicits._
    // Independent 2x2 uniform: MI = 0 exactly.
    val ind = Seq(("x", "u"), ("x", "v"), ("y", "u"), ("y", "v")).toDF("a", "b")
    val mi0 = Profiling.mutualInfo(ind, "a", "b")
      .as[(Long, Long, Double)].collect().head
    assert(mi0 == ((4L, 4L, 0.0)))
    // Bijection over 2 uniform values: MI = ln 2 (rounded recipe:
    // round(ln 2, 6) accumulates exactly).
    val bij = Seq(("x", "u"), ("y", "v"), ("x", "u"), ("y", "v")).toDF("a", "b")
    val mi1 = Profiling.mutualInfo(bij, "a", "b")
      .as[(Long, Long, Double)].collect().head
    assert(mi1 == ((4L, 2L, 0.693147))) // round(ln 2, 6)
  }
}
