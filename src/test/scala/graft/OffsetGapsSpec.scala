package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Checks

/** Checks.offsetGaps: interior gaps, boundary gaps spanning EMPTY
  * buckets, and row-for-row equality with the naive global-lag
  * formulation on random data.
  */
class OffsetGapsSpec extends SparkSpec {
  import spark.implicits._

  test("interior and multi-empty-bucket boundary gaps") {
    val ids = Seq(0L, 1L, 5L, 6L, 42L, 43L).toDF("id")
    val got = Checks.offsetGaps(ids, "id", bucketWidth = 10)
      .select("gap_start", "next_present", "n_missing")
      .as[(Long, Long, Long)].collect().toSet
    // 2..4 missing (interior), 7..41 missing (spans buckets 0→4,
    // buckets 1-3 entirely empty)
    assert(got == Set((2L, 5L, 3L), (7L, 42L, 35L)))
  }

  test("no gaps on a dense range") {
    assert(Checks.offsetGaps(spark.range(0, 1000).toDF("id"), "id", 64)
      .count() == 0)
  }

  test("equals the naive global lag on random sparse ids") {
    val rnd = new scala.util.Random(11)
    val ids = (0 until 3000).map(_ => rnd.nextInt(20000).toLong)
      .distinct.toDF("id")
    val fast = Checks.offsetGaps(ids, "id", 97)
      .select("gap_start", "next_present").as[(Long, Long)]
      .collect().toSet
    val naive = ids.withColumn("p", lag(col("id"), 1).over(
        Window.orderBy(col("id"))))
      .where(col("p").isNotNull && col("id") > col("p") + 1)
      .select((col("p") + 1).as("s"), col("id"))
      .as[(Long, Long)].collect().toSet
    assert(fast == naive)
    assert(fast.nonEmpty)
  }
}
