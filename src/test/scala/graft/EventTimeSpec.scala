package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventTime

/** Event-time windows + watermark: windows finalize exactly once when
  * the watermark passes their end, and rows arriving behind the
  * watermark are dropped — the state-bounding contract that lets the
  * aggregation run forever.
  */
class EventTimeSpec extends SparkSpec {

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("append-mode window finalizes on watermark; late rows are dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Timestamp, String)]
    val out = EventTime.windowedCounts(
      stream.toDF().toDF("ts", "k"), "ts", "k",
      windowLen = "10 seconds", watermarkDelay = "5 seconds")

    val query = out.writeStream
      .format("memory").queryName("win_counts")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1: two on-time rows in window [0,10)
      stream.addData(Seq(ts(1) -> "a", ts(3) -> "a"))
      query.processAllAvailable()
      assert(spark.table("win_counts").isEmpty,
        "watermark (max 3s − 5s) has not passed the window end yet")

      // batch 2: event at 30s advances the watermark to 25s ≥ 10s —
      // window [0,10) finalizes with exactly the on-time rows
      stream.addData(Seq(ts(30) -> "a"))
      query.processAllAvailable()
      val finalized = spark.table("win_counts")
        .select(col("win_start").cast("long"), col("k"), col("n"))
        .as[(Long, String, Long)].collect().toSet
      assert(finalized == Set((0L, "a", 2L)), s"got $finalized")

      // batch 3: a row at 4s is behind the 25s watermark → dropped;
      // its window already finalized and must NOT re-emit or update
      stream.addData(Seq(ts(4) -> "a"))
      query.processAllAvailable()
      val after = spark.table("win_counts")
        .select(col("win_start").cast("long"), col("k"), col("n"))
        .as[(Long, String, Long)].collect().toSet
      assert(after == Set((0L, "a", 2L)), "late row must be dropped")
      val dropped = query.lastProgress.stateOperators.asScala
        .map(_.numRowsDroppedByWatermark).sum
      assert(dropped == 1L, s"watermark drop counter should record it, got $dropped")

      // the open window [30,40) holds state but hasn't emitted
      assert(!after.exists(_._1 == 30L))
    } finally query.stop()
  }

  private implicit class ArrayOps[T](a: Array[T]) {
    def asScala: Seq[T] = a.toSeq
  }
}
