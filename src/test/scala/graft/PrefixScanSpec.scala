package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.PrefixScan

/** The two-level prefix scan must equal the naive single-partition
  * window row for row, and its plan must NOT contain a global
  * (partition-less) window over the data table — that's the whole
  * point of the operator.
  */
class PrefixScanSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private lazy val data = (0 until 5000)
    .map(i => (i.toLong, rnd.nextInt(1000).toLong))
    .toDF("ord", "v")

  test("runningMax equals the naive global window") {
    val fast = PrefixScan.runningMax(data, "ord", "v", "rm", bucketWidth = 97)
      .select("ord", "rm").as[(Long, Long)].collect().toMap
    val naive = data.withColumn("rm", max(col("v")).over(
        Window.orderBy(col("ord"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("ord", "rm").as[(Long, Long)].collect().toMap
    assert(fast == naive)
  }

  test("runningSum equals the naive global window") {
    val fast = PrefixScan.runningSum(data, "ord", "v", "rs", bucketWidth = 97)
      .select("ord", "rs").as[(Long, Long)].collect().toMap
    val naive = data.withColumn("rs", sum(col("v")).over(
        Window.orderBy(col("ord"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("ord", "rs").as[(Long, Long)].collect().toMap
    assert(fast == naive)
  }

  test("runningSumRanged equals the naive global window on sparse keys") {
    // sparse, clustered order keys — the domain div-bucketing cannot
    // handle — with unique keys so row-level equality is well-defined
    val rnd2 = new scala.util.Random(13)
    val sparse = (0 until 4000)
      .map(i => (i.toLong * 1000003L + rnd2.nextInt(500), rnd2.nextInt(9).toLong - 4))
      .toDF("ord", "v")
    val fast = graft.operators.PrefixScan
      .runningSumRanged(sparse, "ord", "v", "rs", partitions = 7)
      .select("ord", "rs").as[(Long, Long)].collect().toMap
    val naive = sparse.withColumn("rs", sum(col("v")).over(
        Window.orderBy(col("ord"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("ord", "rs").as[(Long, Long)].collect().toMap
    assert(fast == naive)
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }

  test("sparse buckets: carry propagates across empty bucket gaps") {
    val sparse = Seq((0L, 5L), (1L, 3L), (1000L, 1L), (5000L, 2L))
      .toDF("ord", "v")
    val got = PrefixScan.runningMax(sparse, "ord", "v", "rm", 10)
      .select("ord", "rm").as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 5L, 1L -> 5L, 1000L -> 5L, 5000L -> 5L))
    val gotSum = PrefixScan.runningSum(sparse, "ord", "v", "rs", 10)
      .select("ord", "rs").as[(Long, Long)].collect().toMap
    assert(gotSum == Map(0L -> 5L, 1L -> 8L, 1000L -> 9L, 5000L -> 11L))
  }

  test("plan: the only partition-less window runs over the bucket table") {
    val plan = PrefixScan.runningMax(data, "ord", "v", "rm", 97)
      .queryExecution.optimizedPlan.toString
    // the data-table window must be keyed by the bucket column; a
    // global sort of the data itself would show a Window with an
    // empty partition spec directly over the input relation. We
    // assert the in-bucket window is partitioned.
    assert(plan.contains("partitionBy") || plan.contains("__pb")
      || plan.contains("windowspecdefinition(__pb"),
      s"no bucket-partitioned window found in plan:\n$plan")
  }
}
