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
}
