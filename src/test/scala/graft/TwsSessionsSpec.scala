package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.TwsSessions

/** Event-time-timer sessionization on transformWithState: the timer
  * discipline (one live timer per key, −1 ms slack, emit on watermark
  * proof) must reproduce the built-in session_window + watermark
  * semantics exactly — cross-batch merges, exact-boundary
  * finalization, and row-for-row parity with q_stream_session on real
  * data.
  */
class TwsSessionsSpec extends SparkSpec {

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocksdb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[A](body: => A): A = {
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocksdb)
    try body
    finally prior match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("sessions merge across batches and emit when the watermark passes end + gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val stream = MemoryStream[(Timestamp, Long)]
      // gap 30s, watermark delay 5s
      val out = TwsSessions.sessionStream(
        stream.toDF().toDF("tstamp", "user_id")
          .withWatermark("tstamp", "5 seconds"),
        "tstamp", "user_id", gapUs = 30000000L)
      val query = out.toDF().writeStream.format("memory")
        .queryName("tws_sessions")
        .outputMode(OutputMode.Append()).start()
      try {
        def emitted(): Set[(Long, Long, Long)] =
          spark.table("tws_sessions")
            .as[(Long, Long, Long)].collect().toSet

        // batch 1: user 1 at 10s and 20s — one open session
        stream.addData(Seq(ts(10) -> 1L, ts(20) -> 1L))
        query.processAllAvailable()
        assert(emitted().isEmpty, "open session must not emit")

        // batch 2: 30s EXTENDS the session (cross-batch merge);
        // user 2 far ahead pushes the watermark to 95s — past the
        // extended session's close (30+30=60s), but the watermark
        // update is visible to timers only from the NEXT batch
        stream.addData(Seq(ts(30) -> 1L, ts(100) -> 2L))
        query.processAllAvailable()

        // batch 3: any new data lets the pending timer fire with the
        // advanced watermark — the merged session [10s..30s] n=3 emits
        stream.addData(Seq(ts(101) -> 2L))
        query.processAllAvailable()
        assert(emitted() == Set((1L, 10000000L, 3L)),
          s"merged session must emit once, got ${emitted()}")

        // exact boundary: user 3 session closes at 200+30=230s; an
        // event at 235s puts the watermark at EXACTLY 230s — equality
        // must finalize (the <= the oracles replay)
        stream.addData(Seq(ts(200) -> 3L))
        query.processAllAvailable()
        stream.addData(Seq(ts(235) -> 2L))
        query.processAllAvailable()
        stream.addData(Seq(ts(236) -> 2L))
        query.processAllAvailable()
        assert(emitted().contains((3L, 200000000L, 1L)),
          s"watermark == close must finalize, got ${emitted()}")

        // an event INSIDE an open session's span but above the
        // watermark merges instead of forking (out-of-order, on-time):
        // user 2's events 100/101/235/236 are one session (gaps < 30s
        // except 101->235 — so TWO sessions; 235s one still open);
        // nothing for user 2 before 101+30=131 <= wm: wm is 231 after
        // batch with 236 — so [100,101] n=2 emitted
        assert(emitted().contains((2L, 100000000L, 2L)),
          s"user 2 first session must have emitted, got ${emitted()}")
      } finally {
        query.stop()
        spark.catalog.dropTempView("tws_sessions")
      }
    }
  }

  test("q_stream_session_tws == q_stream_session row-for-row on sf0.001") {
    import spark.implicits._
    val tws = SparkEntry.registry("q_stream_session_tws")
      .build(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect().toSeq
    val builtin = SparkEntry.registry("q_stream_session")
      .build(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect().toSeq
    assert(tws.nonEmpty, "tws sessionizer returned nothing")
    assert(tws == builtin,
      s"timer-driven sessions diverge from session_window: " +
        s"tws=${tws.size} rows, builtin=${builtin.size} rows, " +
        s"firstDiff=${tws.zip(builtin).find(p => p._1 != p._2)}")
  }
}
