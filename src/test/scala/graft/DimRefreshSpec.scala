package graft

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Dimension-refresh semantics, both ways (the probed fact behind
  * q_stream_enrich's comment): a stream-static join pins the static
  * side's FILE LISTING at plan time — files appended between batches
  * are invisible — while a `foreachBatch` body that re-reads the
  * dimension path sees them at the very next batch (the engine's own
  * StreamRunner loop is foreachBatch, so its per-batch state reads get
  * refresh semantics for free).
  */
class DimRefreshSpec extends SparkSpec {

  test("stream-static join does NOT see dim files appended between batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dimDir = Files.createTempDirectory("dim_pin").toString
    Seq((1L, "alpha")).toDF("k", "name").write.mode("append").parquet(dimDir)
    val stream = MemoryStream[(Long, Long)]
    val joined = stream.toDF().toDF("id", "k")
      .join(broadcast(spark.read.parquet(dimDir)), "k")
      .select(col("id"), col("name"))
    val q = joined.writeStream.format("memory").queryName("dim_pin")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(Seq(10L -> 1L))
      q.processAllAvailable()
      Seq((2L, "beta")).toDF("k", "name").write.mode("append").parquet(dimDir)
      stream.addData(Seq(11L -> 2L, 12L -> 1L))
      q.processAllAvailable()
      val got = spark.table("dim_pin").as[(Long, String)].collect().toSet
      // 11 -> beta is NOT matched: the listing was pinned at plan time
      assert(got == Set(10L -> "alpha", 12L -> "alpha"), got.toString)
    } finally { q.stop(); spark.catalog.dropTempView("dim_pin") }
  }

  test("a foreachBatch re-read sees the appended dimension at the next batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dimDir = Files.createTempDirectory("dim_fresh").toString
    Seq((1L, "alpha")).toDF("k", "name").write.mode("append").parquet(dimDir)
    val stream = MemoryStream[(Long, Long)]
    val out = mutable.Set.empty[(Long, String)]
    val q = stream.toDF().toDF("id", "k").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val dim = batch.sparkSession.read.parquet(dimDir)
        out ++= batch.join(broadcast(dim), "k")
          .select(col("id"), col("name"))
          .collect().map(r => (r.getLong(0), r.getString(1)))
        ()
      }
      .start()
    try {
      stream.addData(Seq(10L -> 1L, 11L -> 2L))
      q.processAllAvailable()
      assert(out.toSet == Set(10L -> "alpha"), out.toString) // no beta yet
      Seq((2L, "beta")).toDF("k", "name").write.mode("append").parquet(dimDir)
      stream.addData(Seq(12L -> 2L))
      q.processAllAvailable()
      assert(out.toSet == Set(10L -> "alpha", 12L -> "beta"), out.toString)
    } finally q.stop()
  }
}
