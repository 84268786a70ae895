package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

import graft.streaming.EventTime

/** Streaming state survives a QUERY RESTART from its checkpoint: stop
  * a windowed aggregation mid-stream (open windows unemitted), start a
  * new query over the same checkpoint, feed the rest — the recovered
  * run must finalize exactly the windows an uninterrupted run would,
  * exactly once, no duplicates across the two query incarnations. This
  * is the query-level commit-protocol contract (SURVEY §2.6 T7) that
  * the per-batch checkpoint tests can't see. The sink is the file sink
  * (parquet + _spark_metadata exactly-once manifest) because the
  * memory sink refuses checkpoint recovery by design.
  */
class StreamRestartSpec extends SparkSpec {

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("windowed aggregation resumes from checkpoint: open state finalizes exactly once after restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ckpt = java.nio.file.Files.createTempDirectory("graft_restart_ckpt")
    val outDir = java.nio.file.Files.createTempDirectory("graft_restart_out")
    val outSchema = StructType(Seq(
      StructField("win_start", TimestampType), StructField("win_end", TimestampType),
      StructField("k", StringType), StructField("n", LongType)))
    def readOut() = spark.read.schema(outSchema).parquet(outDir.toString)
      .select(col("win_start").cast("long"), col("k"), col("n"))
      .as[(Long, String, Long)].collect().toSeq

    val stream = MemoryStream[(Timestamp, String)]
    def start() = EventTime.windowedCounts(
        stream.toDF().toDF("ts", "k"), "ts", "k",
        windowLen = "10 seconds", watermarkDelay = "5 seconds")
      .writeStream.format("parquet")
      .option("path", outDir.toString)
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt.toString).start()

    // phase 1: three events over two windows; watermark 7s — both
    // windows still OPEN (nothing emitted) when the query stops
    val q1 = start()
    stream.addData(Seq(ts(1) -> "a", ts(3) -> "a", ts(12) -> "b"))
    q1.processAllAvailable()
    q1.stop()
    val phase1 = readOut()
    assert(phase1.isEmpty, s"windows must still be open at stop: $phase1")

    // phase 2: NEW query, SAME checkpoint + sink — an event at 25s
    // moves the watermark to 20s; the recovered state must emit both
    // pre-restart windows (with pre-restart counts), exactly once
    val q2 = start()
    try {
      stream.addData(Seq(ts(25) -> "a"))
      q2.processAllAvailable()
      val phase2 = readOut()
      assert(phase2.toSet == Set((0L, "a", 2L), (10L, "b", 1L)),
        s"recovered state must finalize pre-restart windows once: $phase2")
      assert(phase2.size == 2, s"no duplicate emissions on replay: $phase2")
    } finally {
      q2.stop()
      import scala.jdk.CollectionConverters._
      Seq(ckpt, outDir).foreach { d =>
        java.nio.file.Files.walk(d).iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
  }
}
