package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.core.Tables
import graft.streaming.EventTime

/** The streaming-runtime queries (queries/Streams.scala): their
  * determinism contract rests on two runtime behaviors this suite
  * pins — (1) append mode finalizes a window at watermark EQUALITY
  * with its end (non-strict, the `<=` the DuckDB oracles replay), and
  * (2) `Trigger.AvailableNow` over a static file runs the no-data
  * batch that advances the watermark and flushes finalized state
  * before terminating (without it every append-mode query here would
  * return empty). Each query is also checked against an in-Spark
  * batch replay at sf0.001 — the same arithmetic the DuckDB oracle
  * runs at sf0.01, but visible to `sbt test` without the driver.
  */
class StreamQuerySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("append mode emits a window exactly when the watermark reaches its end") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Timestamp, String)]
    val out = EventTime.windowedCounts(
      stream.toDF().toDF("ts", "k"), "ts", "k",
      windowLen = "10 seconds", watermarkDelay = "5 seconds")
    val query = out.writeStream.format("memory").queryName("wm_boundary")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(Seq(ts(1) -> "a", ts(3) -> "a"))
      query.processAllAvailable()
      // 15s advances the watermark to exactly 10s — the window [0,10)
      // must finalize at equality: no event < 10s can still arrive
      // once the watermark is 10s, because rows AT the watermark are
      // late. The q_stream_* oracles encode this as `win_end <= w`.
      stream.addData(Seq(ts(15) -> "a"))
      query.processAllAvailable()
      val got = spark.table("wm_boundary")
        .select(col("win_start").cast("long"), col("n"))
        .as[(Long, Long)].collect().toSet
      assert(got == Set((0L, 2L)),
        s"window [0,10) must emit at watermark == 10, got $got")
    } finally query.stop()
  }

  test("left-outer interval join: unmatched left null-emits exactly when the watermark passes l_ts + upper + 1ms") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // Times sit far from epoch 0 on purpose: the join input filter
    // drops rows with ts <= current watermark, and the initial
    // watermark is 0 — a row at exactly epoch 0 is silently treated as
    // late and never enters join state (cost this suite a long probe
    // session to discover).
    val base = 1000L
    val ls = MemoryStream[(Timestamp, String, Long)]
    val rs = MemoryStream[(Timestamp, String, Long)]
    val out = EventTime.intervalJoin(
      ls.toDF().toDF("ts", "k", "id"), rs.toDF().toDF("ts", "k", "id"),
      "k", "ts", "ts",
      lowerBound = "0 seconds", upperBound = "10 seconds",
      watermarkDelay = "5 seconds", joinType = "left_outer")
    val query = out.writeStream.format("memory").queryName("loj_boundary")
      .outputMode(OutputMode.Append()).start()
    def rows(): Set[(Long, Option[Long])] = spark.table("loj_boundary")
      .select(col("l_val.id"), col("r_val.id"))
      .as[(Long, Option[Long])].collect().toSet
    try {
      // left row at base never matches; a matched pair (b) shows inner
      // rows emit immediately, regardless of the watermark
      ls.addData(Seq((ts(base), "a", 1L), (ts(base + 1), "b", 2L)))
      rs.addData(Seq((ts(base + 2), "b", 20L)))
      query.processAllAvailable()
      assert(rows() == Set(2L -> Some(20L)),
        s"inner match must emit before any watermark movement, got ${rows()}")

      // advance BOTH watermarks to exactly base+10s (= l_ts + upper):
      // max event base+15 minus 5s delay. A partner AT l_ts + upper is
      // still admissible, so the row must NOT null-emit yet.
      ls.addData(Seq((ts(base + 15), "z", 3L)))
      rs.addData(Seq((ts(base + 15), "z", 30L)))
      query.processAllAvailable()
      assert(rows() == Set(2L -> Some(20L), 3L -> Some(30L)),
        s"unmatched left must not emit at watermark == l_ts + upper, got ${rows()}")

      // at watermark == l_ts + upper + 1ms the state-cleanup predicate
      // (l_ts <= watermark - upper - 1ms, non-strict) first admits the
      // row: it evicts and null-emits. The q_stream_join_outer oracle
      // replays exactly this boundary.
      ls.addData(Seq((new Timestamp(base * 1000 + 15001L), "z2", 4L)))
      rs.addData(Seq((new Timestamp(base * 1000 + 15001L), "z2", 40L)))
      query.processAllAvailable()
      assert(rows().contains(1L -> None),
        s"unmatched left must null-emit at watermark == l_ts + upper + 1ms, got ${rows()}")
      // matched left rows and matched right rows never null-emit
      assert(!rows().exists(r => r._1 == 2L && r._2.isEmpty))
    } finally {
      query.stop()
      spark.catalog.dropTempView("loj_boundary")
    }
  }

  test("q_stream_window: AvailableNow flushes finalized windows; matches batch replay") {
    import spark.implicits._
    val streamed = SparkEntry.registry("q_stream_window").build(spark, dir)
      .as[(Long, String, Long)].collect().toSeq
    assert(streamed.nonEmpty,
      "empty result means AvailableNow never ran the watermark-flushing no-data batch")

    val e = Tables.load(spark, dir, "events")
      .select(timestamp_micros(expr("ts div 1000")).as("tstamp"),
        col("event_type"), expr("ts div 1000").as("us"))
    val cutoff = {
      val maxUs = e.agg(max("us")).head().getLong(0)
      (maxUs / 1000 - 1800000) * 1000
    }
    val batch = e.groupBy(window(col("tstamp"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .where(unix_micros(col("window.end")) <= cutoff)
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("event_type"), col("n"))
      .as[(Long, String, Long)].collect().toSeq
    assert(streamed.toSet == batch.toSet)
    assert(streamed.size == batch.size)
  }

  test("q_stream_session matches the batch session_window replay") {
    import spark.implicits._
    val streamed = SparkEntry.registry("q_stream_session").build(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(streamed.nonEmpty)

    val e = Tables.load(spark, dir, "events")
      .select(col("user_id"), timestamp_micros(expr("ts div 1000")).as("tstamp"),
        expr("ts div 1000").as("us"))
    val cutoff = {
      val maxUs = e.agg(max("us")).head().getLong(0)
      (maxUs / 1000 - 1800000) * 1000
    }
    val batch = e.groupBy(col("user_id"), session_window(col("tstamp"), "30 minutes"))
      .agg(min("us").as("sess_start_us"), count(lit(1)).as("n_events"))
      .where(unix_micros(col("session_window.end")) <= cutoff)
      .select(col("user_id"), col("sess_start_us"), col("n_events"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(streamed.toSet == batch.toSet)
    assert(streamed.size == batch.size)
  }

  test("q_stream_dedup: one decision per doc, canonical = min doc_id per hash") {
    import spark.implicits._
    val got = SparkEntry.registry("q_stream_dedup").build(spark, dir)
      .select(col("doc_id"), col("content_hash"),
        coalesce(col("dup_of"), lit(-1L)).as("dup_of"))
      .as[(Long, String, Long)].collect().toSeq
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), md5(col("text")).as("h"))
    assert(got.size == docs.count(), "exactly one decision row per document")
    val expected = docs
      .withColumn("canon", min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("h")))
      .select(col("doc_id"), col("h"),
        when(col("doc_id") === col("canon"), lit(-1L))
          .otherwise(col("canon")).as("dup_of"))
      .as[(Long, String, Long)].collect().toSeq
    assert(got.toSet == expected.toSet)
    // The driver-generated corpus carries no exact duplicate texts (an
    // r9 regeneration removed the planted ones), so dup_of is all-null
    // here; the actual first-wins dup behavior — within-batch,
    // cross-batch, late copies — is pinned on planted fixtures in
    // StreamingDedupSpec.
  }

  test("q_stream_join matches the batch interval join and tears down its sink") {
    import spark.implicits._
    val got = SparkEntry.registry("q_stream_join").build(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty)

    val e = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000").as("us"))
    val v = e.where(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("us").as("view_us"))
    val p = e.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_uid"), col("event_id").as("purchase_id"),
        col("us").as("purchase_us"))
    val batch = v.join(p, col("user_id") === col("p_uid") &&
        col("purchase_us") >= col("view_us") &&
        col("purchase_us") <= col("view_us") + 1800000000L)
      .select(col("user_id"), col("view_id"), col("view_us"),
        col("purchase_id"), col("purchase_us"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.toSet == batch.toSet)
    assert(got.size == batch.size)

    // runStream drops its memory-sink view — nothing leaks into the
    // shared session's catalog across bench passes
    val leaked = spark.catalog.listTables().collect()
      .filter(_.name.startsWith("graft_stream_sink_"))
    assert(leaked.isEmpty, s"leaked memory sinks: ${leaked.map(_.name).toSeq}")
  }

  test("multi-batch replay (maxFilesPerTrigger=1) matches every single-batch stream result") {
    import java.nio.file.{Files, Path, Paths}
    import java.nio.file.attribute.FileTime
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.DataFrame

    // split sf0.001 events into 4 TIME-ORDERED parquet files with
    // ascending mod-times: FileStreamSource admits them oldest-first,
    // one per micro-batch, so the watermark advances batch by batch
    // and state (windows, sessions, join buffers) must carry across
    // batches — the thing the AvailableNow single-batch runs of the
    // q_stream_* queries cannot exercise.
    val chunkDir = Files.createTempDirectory("graft_mb")
    val e = Tables.load(spark, dir, "events")
      .withColumn("tstamp", timestamp_micros(expr("ts div 1000")))
      .drop("ts", "props")
    val ordered = e.withColumn("__c", ntile(4).over(
      org.apache.spark.sql.expressions.Window.orderBy("tstamp", "event_id")))
    for (k <- 1 to 4) {
      val sub = Files.createTempDirectory("graft_mb_part")
      ordered.where(col("__c") === k).drop("__c")
        .coalesce(1).write.mode("overwrite").parquet(sub.toString)
      val part = Files.list(sub).iterator().asScala
        .find(_.toString.endsWith(".parquet")).get
      val dest = chunkDir.resolve(f"chunk_$k%02d.parquet")
      Files.move(part, dest)
      Files.setLastModifiedTime(dest, FileTime.fromMillis(1000000L + k * 10000L))
    }
    val sch = spark.read.parquet(chunkDir.resolve("chunk_01.parquet").toString).schema
    def chunkStream(): DataFrame = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1")
      .option("basePath", chunkDir.toString)
      .parquet(s"$chunkDir/*.parquet")

    var lastBatches = 0L
    def run(df: DataFrame): DataFrame = {
      val name = "graft_mb_sink"
      val ckpt = Files.createTempDirectory("graft_mb_ckpt")
      val q = df.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      lastBatches = q.recentProgress.map(_.batchId).max
      val out = spark.table(name).localCheckpoint(true)
      q.stop()
      spark.catalog.dropTempView(name)
      Files.walk(ckpt).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach((p: Path) => Files.deleteIfExists(p))
      out
    }

    // windows
    val mbWindow = run(EventTime.windowedCounts(chunkStream(), "tstamp",
        "event_type", windowLen = "1 hour", watermarkDelay = "30 minutes"))
      .select(unix_micros(col("win_start")).as("w"), col("event_type"), col("n"))
      .collect().toSet
    assert(lastBatches >= 4, s"expected one batch per chunk, got $lastBatches")
    val sbWindow = SparkEntry.registry("q_stream_window").build(spark, dir)
      .collect().toSet
    assert(mbWindow == sbWindow, "multi-batch windows != single-batch windows")

    // sessions
    val mbSession = run(EventTime.sessionCounts(chunkStream(), "tstamp",
        "user_id", gap = "30 minutes", watermarkDelay = "30 minutes"))
      .select(col("user_id"), unix_micros(col("sess_start")), col("n"))
      .collect().toSet
    val sbSession = SparkEntry.registry("q_stream_session").build(spark, dir)
      .collect().toSet
    assert(mbSession == sbSession, "multi-batch sessions != single-batch sessions")

    // stream-stream joins, inner and left-outer: matches and
    // null-extensions must survive batch boundaries (a view in chunk k
    // joining a purchase in chunk k+1 exercises cross-batch state)
    def side(kind: String) = chunkStream().where(col("event_type") === kind)
      .select(col("user_id"), col("tstamp"), col("event_id"))
    for ((joinType, qname) <- Seq("inner" -> "q_stream_join",
        "left_outer" -> "q_stream_join_outer")) {
      val mb = run(EventTime.intervalJoin(
          side("view"), side("purchase"), "user_id", "tstamp", "tstamp",
          lowerBound = "0 seconds", upperBound = "30 minutes",
          watermarkDelay = "30 minutes", joinType = joinType))
        .select(col("l_val.event_id"), col("r_val.event_id"))
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      val sb = SparkEntry.registry(qname).build(spark, dir)
        .select(col("view_id"), coalesce(col("purchase_id"), lit(-1L)))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(mb == sb, s"multi-batch $joinType join != single-batch $qname")
    }

    Files.walk(chunkDir).iterator().asScala.toSeq
      .sortBy(-_.getNameCount).foreach((p: Path) => Files.deleteIfExists(p))
  }

  test("a row behind the advanced watermark is dropped and counted") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String)]
    val out = EventTime.windowedCounts(stream.toDF().toDF("ts", "k"), "ts", "k",
      windowLen = "10 seconds", watermarkDelay = "5 seconds")
    val query = out.writeStream.format("memory").queryName("late_drop")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(Seq(ts(1000) -> "a", ts(2000) -> "a"))
      query.processAllAvailable() // watermark now 1995s
      stream.addData(Seq(ts(100) -> "late"))
      query.processAllAvailable()
      val dropped = query.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
      assert(dropped >= 1L, s"late row must be counted as dropped, got $dropped")
      // and it never surfaces: no window for key "late" can ever emit
      stream.addData(Seq(ts(3000) -> "a"))
      query.processAllAvailable()
      val keys = spark.table("late_drop").select("k").as[String].collect().toSet
      assert(!keys.contains("late"), "dropped row must not contribute output")
    } finally {
      query.stop()
      spark.catalog.dropTempView("late_drop")
    }
  }

  test("q_stream_join_outer matches a batch replay of the null-emission cutoff") {
    import spark.implicits._
    val got = SparkEntry.registry("q_stream_join_outer").build(spark, dir)
      .select(col("view_id"), coalesce(col("purchase_id"), lit(-1L)))
      .as[(Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    assert(got.exists(_._2 == -1L), "expected at least one null-extended view")

    val e = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000").as("us"))
    val v = e.where(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("us").as("view_us"))
    val p = e.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_uid"), col("event_id").as("purchase_id"),
        col("us").as("purchase_us"))
    // global watermark = min over sides of (max event-ms − 30min)
    val wMs = math.min(
      v.agg(max(expr("view_us div 1000"))).head().getLong(0),
      p.agg(max(expr("purchase_us div 1000"))).head().getLong(0)) - 1800000L
    val joined = v.join(p, col("user_id") === col("p_uid") &&
        col("purchase_us") >= col("view_us") &&
        col("purchase_us") <= col("view_us") + 1800000000L, "left_outer")
    val batch = joined
      .where(col("purchase_id").isNotNull ||
        col("view_us") <= (wMs - 1800001L) * 1000L)
      .select(col("view_id"), coalesce(col("purchase_id"), lit(-1L)))
      .as[(Long, Long)].collect().toSeq
    assert(got.toSet == batch.toSet)
    assert(got.size == batch.size)
  }
}
