package graft

import org.apache.spark.sql.functions._

import graft.sources.Bucketing

/** Bucketed join co-location: joining two tables bucketed on the join
  * key must produce a physical plan with NO shuffle exchange on the
  * bucketed sides — the write-once-shuffle-never contract that makes
  * the denormalization joins scale. */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables has no shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    val o = graft.core.Tables.load(spark, dir, "orders")
    val c = graft.core.Tables.load(spark, dir, "customer")
    Bucketing.writeBucketed(o.withColumnRenamed("o_custkey", "custkey"),
      "b_orders", "custkey", 8)
    Bucketing.writeBucketed(c.withColumnRenamed("c_custkey", "custkey"),
      "b_customer", "custkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the assertion really exercises the
      // bucketed sort-merge path
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.read(spark, "b_orders")
        .join(Bucketing.read(spark, "b_customer"), "custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"unexpected shuffle in bucketed join plan:\n$plan")
      // sanity: result matches the plain join
      val expected = o.join(c, o("o_custkey") === c("c_custkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
