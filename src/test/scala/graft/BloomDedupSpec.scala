package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** [[Dedup.bloomNovel]] — bloom-prefiltered incremental dedup. */
class BloomDedupSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  test("novel = exact anti-join of batch vs seen; dups dropped") {
    val seen = df(Seq(1L -> "alpha text", 2L -> "beta text"))
    val batch = df(Seq(10L -> "alpha text", 11L -> "gamma text",
      12L -> "delta text", 13L -> "beta text"))
    val got = Dedup.bloomNovel(batch, seen, "text", expectedItems = 100L)
      .select("doc_id").as[Long].collect().sorted
    assert(got.toSeq == Seq(11L, 12L))
  }

  test("empty seen corpus: everything is novel") {
    val seen = df(Seq.empty).where(lit(false))
    val batch = df(Seq(1L -> "a", 2L -> "b"))
    val got = Dedup.bloomNovel(batch, seen, "text", expectedItems = 100L)
      .count()
    assert(got == 2L)
  }

  test("matches the plain anti-join on real documents at any fpp") {
    val d = core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val batch = d.where(col("doc_id") % 7 < 2)
    val seen = d.where(col("doc_id") % 7 >= 2)
    val expected = batch
      .join(seen.select(md5(col("text")).as("__sh")).distinct(),
        md5(col("text")) === col("__sh"), "left_anti")
      .select("doc_id").as[Long].collect().sorted.toSeq
    // A deliberately tiny filter (high fpp) floods the verifier with
    // false positives — the result must not change, only the cost.
    for (fpp <- Seq(0.5, 0.01)) {
      val got = Dedup.bloomNovel(batch, seen, "text",
        expectedItems = 10L, fpp = fpp)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(got == expected, s"fpp=$fpp")
    }
    assert(expected.nonEmpty)
  }

  test("plan shape: bloom probe is a scalar subquery, corpus side aggregates") {
    val d = core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val batch = d.where(col("doc_id") % 7 < 2)
    val seen = d.where(col("doc_id") % 7 >= 2)
    // The optimized logical plan (AQE plans physical subqueries only at
    // execution time): the probe must be a might_contain over a scalar
    // subquery whose plan is the single bloom aggregation.
    val df = Dedup.bloomNovel(batch, seen, "text", expectedItems = 1000L)
    val s = df.queryExecution.optimizedPlan.toString
    assert(s.contains("might_contain"), "bloom probe missing from the plan")
    assert(s.contains("scalar-subquery"), "bloom must ship as a scalar subquery")
    assert(s.contains("bloom_filter_agg"),
      "seen side must collapse to one bloom aggregation")
  }
}
