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

  test("streaming session windows merge on gap, finalize on watermark, and match batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Timestamp, String)]
    val out = EventTime.sessionCounts(
      stream.toDF().toDF("ts", "k"), "ts", "k",
      gap = "10 seconds", watermarkDelay = "5 seconds")

    val query = out.writeStream
      .format("memory").queryName("sess_counts")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // one key, two bursts: (1,4,8) chain within the 10s gap; then 40
      stream.addData(Seq(ts(1) -> "a", ts(4) -> "a", ts(8) -> "a", ts(40) -> "a"))
      query.processAllAvailable()
      // watermark = 40-5 = 35 ≥ first session end (8+10=18) → finalized;
      // the 40s session is still open
      val first = spark.table("sess_counts")
        .select(col("sess_start").cast("long"), col("sess_end").cast("long"),
          col("k"), col("n"))
        .as[(Long, Long, String, Long)].collect().toSet
      assert(first == Set((1L, 18L, "a", 3L)), s"got $first")

      // extend the open session (45 within gap of 40), then advance the
      // watermark far enough to close it
      stream.addData(Seq(ts(45) -> "a"))
      query.processAllAvailable()
      stream.addData(Seq(ts(200) -> "b"))
      query.processAllAvailable()
      val all = spark.table("sess_counts")
        .select(col("sess_start").cast("long"), col("sess_end").cast("long"),
          col("k"), col("n"))
        .as[(Long, Long, String, Long)].collect().toSet
      assert(all == Set((1L, 18L, "a", 3L), (40L, 55L, "a", 2L)), s"got $all")

      // batch parity: the same operator over the same rows as one frame
      val batch = EventTime.sessionCounts(
        Seq(ts(1) -> "a", ts(4) -> "a", ts(8) -> "a", ts(40) -> "a",
          ts(45) -> "a", ts(200) -> "b").toDF("ts", "k"),
        "ts", "k", "10 seconds", "5 seconds")
        .select(col("sess_start").cast("long"), col("sess_end").cast("long"),
          col("k"), col("n"))
        .as[(Long, Long, String, Long)].collect().toSet
      assert(all.subsetOf(batch) &&
        (batch -- all) == Set((200L, 210L, "b", 1L)),
        s"batch $batch vs streamed $all (only b's open session may differ)")
    } finally query.stop()
  }

  test("stream-stream interval join matches the batch join and manages bounded state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // views joined to clicks within [0s, 30s] after the view
    val views = MemoryStream[(String, Timestamp, Long)]
    val clicks = MemoryStream[(String, Timestamp, String)]
    val out = EventTime.intervalJoin(
      views.toDF().toDF("user", "ts", "view_id"),
      clicks.toDF().toDF("user", "ts", "target"),
      keyCol = "user", leftTsCol = "ts", rightTsCol = "ts",
      lowerBound = "0 seconds", upperBound = "30 seconds",
      watermarkDelay = "10 seconds")
      .select(col("user"), col("l_ts").cast("long").as("vt"),
        col("l_val.view_id"), col("r_ts").cast("long").as("ct"),
        col("r_val.target"))

    val query = out.writeStream
      .format("memory").queryName("ivj")
      .outputMode(OutputMode.Append())
      .start()
    try {
      val vRows = Seq(("a", ts(10), 1L), ("a", ts(100), 2L), ("b", ts(12), 3L))
      val cRows = Seq(
        ("a", ts(25), "in-range"),     // 15s after view 1 → match
        ("a", ts(45), "too-late"),     // 35s after view 1 → no match
        ("b", ts(12), "same-instant"), // 0s after view 3 → match
        ("c", ts(20), "no-view"))      // key with no view → no match
      views.addData(vRows)
      clicks.addData(cRows)
      query.processAllAvailable()
      // advance both watermarks far past every interval so all matches emit
      views.addData(Seq(("z", ts(1000), 9L)))
      clicks.addData(Seq(("z", ts(1000), "wm")))
      query.processAllAvailable()

      val got = spark.table("ivj")
        .select("user", "view_id", "target")
        .as[(String, Long, String)].collect().toSet
      // batch parity: the SAME operator over the same rows as plain frames
      val batch = EventTime.intervalJoin(
        (vRows ++ Seq(("z", ts(1000), 9L))).toDF("user", "ts", "view_id"),
        (cRows ++ Seq(("z", ts(1000), "wm"))).toDF("user", "ts", "target"),
        "user", "ts", "ts", "0 seconds", "30 seconds", "10 seconds")
        .select(col("user"), col("l_val.view_id"), col("r_val.target"))
        .as[(String, Long, String)].collect().toSet
      assert(got == batch, s"stream $got != batch $batch")
      assert(got == Set(("a", 1L, "in-range"), ("b", 3L, "same-instant"),
        ("z", 9L, "wm")), s"got $got")
      // join state is watermark-managed (present, and rows evict:
      // removed counter advanced once the watermark passed them)
      val ops = query.lastProgress.stateOperators.asScala
      assert(ops.nonEmpty, "no stateful join operator in progress")
      assert(ops.map(_.numRowsRemoved).sum > 0L,
        "watermark advanced past buffered rows but nothing evicted")
    } finally query.stop()
  }

  private implicit class ArrayOps[T](a: Array[T]) {
    def asScala: Seq[T] = a.toSeq
  }
}
