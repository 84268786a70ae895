package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Event-time session windows on `transformWithState` with EVENT-TIME
  * TIMERS — the arbitrary-state twin of
  * [[EventTime.sessionCounts]]'s built-in `session_window` operator,
  * and the one capability class the TWS surface here was still
  * missing: state whose *finalization* is driven by the watermark
  * clock through explicit timer registration
  * (`getHandle.registerTimer`), not by an aggregation operator's
  * internal eviction. This is the shape any custom
  * event-time-bounded state machine takes on the Spark 4 API — KTable
  * retention, order-timeout detection, SLA monitors — sessionization
  * is its canonical instance, and running it beside `session_window`
  * gives an oracle-checkable parity target
  * (`q_stream_session_tws` in [[graft.queries.Streams]]).
  *
  * Semantics (identical to `session_window` + watermark, pinned in
  * TwsSessionsSpec): events of a key group into one session while
  * consecutive gaps stay ≤ `gapUs`; a session finalizes — emits
  * exactly once — when the watermark passes its close time
  * (last event + gap, i.e. `end_us + gapUs <= watermark_us`).
  *
  * Timer discipline (the part the built-in hides): per key at most ONE
  * live timer — the earliest open session's close, registered at
  * `ceil(close_us / 1000) − 1` ms so the strictness of the runtime's
  * fire comparison can never skip an exact-boundary close (an early
  * fire is harmless: the handler re-checks the real watermark and
  * re-registers). Firing order inside a micro-batch is input rows
  * first, then expired timers, so a batch that both extends a session
  * and passes its close still emits the merged session. State per key
  * is the OPEN sessions only — closed sessions leave state at
  * emission, so state is bounded by event spread within the
  * watermark horizon exactly like the built-in operator's.
  *
  * Runs in `TimeMode.EventTime` (requires a watermark on the input's
  * event-time column) on the RocksDB state store provider, same as
  * [[TwsCompaction]].
  */
object TwsSessions {

  /** One input event: key + event time in epoch-μs. */
  final case class SessEvent(user_id: Long, us: Long)

  /** An open session in state: [start_us, end_us] covered, n events. */
  final case class OpenSession(start_us: Long, end_us: Long, n: Long)

  /** A finalized session. */
  final case class Session(user_id: Long, sess_start_us: Long, n_events: Long)

  /** Sessionize a stream. `events` must already carry a watermark on
    * TimestampType column `tsCol`; `keyCol` must be LongType. */
  def sessionStream(
      events: DataFrame, tsCol: String, keyCol: String,
      gapUs: Long): Dataset[Session] = {
    implicit val outEnc = Encoders.product[Session]
    events
      .select(col(keyCol).as("user_id"), unix_micros(col(tsCol)).as("us"))
      .as[SessEvent](Encoders.product[SessEvent])
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new SessionProcessor(gapUs), TimeMode.EventTime(),
        OutputMode.Append())
  }

  private final class SessionProcessor(gapUs: Long)
      extends StatefulProcessor[Long, SessEvent, Session] {

    @transient private var open: ListState[OpenSession] = _
    @transient private var tmr: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      open = getHandle.getListState[OpenSession]("open",
        Encoders.product[OpenSession], TTLConfig.NONE)
      tmr = getHandle.getValueState[Long]("tmr",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    /** Merge-fold: existing open sessions + each event as a unit
      * session, sorted by start; adjacent entries merge while the gap
      * stays ≤ gapUs. Order- and batching-independent by construction
      * (the merge of a sorted set is canonical). */
    private def merged(events: Seq[Long]): Seq[OpenSession] = {
      val units = events.map(u => OpenSession(u, u, 1L))
      val prior = if (open.exists()) open.get().toSeq else Seq.empty
      val all = (prior ++ units).sortBy(s => (s.start_us, s.end_us))
      if (all.isEmpty) return Seq.empty
      val out = scala.collection.mutable.ArrayBuffer[OpenSession](all.head)
      all.tail.foreach { s =>
        val cur = out.last
        if (s.start_us <= cur.end_us + gapUs)
          out(out.size - 1) = OpenSession(cur.start_us,
            math.max(cur.end_us, s.end_us), cur.n + s.n)
        else out += s
      }
      out.toSeq
    }

    /** One live timer per key at the earliest close, −1 ms slack. */
    private def ensureTimer(sessions: Seq[OpenSession], wmMs: Long): Unit = {
      if (sessions.isEmpty) { if (tmr.exists()) tmr.clear(); return }
      val closeUs = sessions.map(_.end_us + gapUs).min
      // fire no later than the watermark reaching close: ceil to ms, −1
      val target = math.max((closeUs + 999) / 1000 - 1, wmMs + 1)
      val current = if (tmr.exists()) Some(tmr.get()) else None
      // keep an existing earlier-or-equal timer (an early fire just
      // re-checks and re-registers); replace a later one
      if (current.forall(_ > target)) {
        current.foreach(getHandle.deleteTimer)
        getHandle.registerTimer(target)
        tmr.update(target)
      }
    }

    private def finalizeReady(
        key: Long, wmUs: Long, wmMs: Long): Iterator[Session] = {
      val sessions = if (open.exists()) open.get().toSeq else Seq.empty
      val (done, still) = sessions.partition(_.end_us + gapUs <= wmUs)
      if (still.isEmpty) open.clear() else open.put(still.toArray)
      if (tmr.exists()) tmr.clear()
      ensureTimer(still, wmMs)
      done.sortBy(_.start_us)
        .map(s => Session(key, s.start_us, s.n)).iterator
    }

    override def handleInputRows(
        key: Long, rows: Iterator[SessEvent],
        timerValues: TimerValues): Iterator[Session] = {
      val next = merged(rows.map(_.us).toSeq)
      if (next.isEmpty) return Iterator.empty
      open.put(next.toArray)
      ensureTimer(next, timerValues.getCurrentWatermarkInMs())
      Iterator.empty
    }

    override def handleExpiredTimer(
        key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Session] = {
      val wmMs = timerValues.getCurrentWatermarkInMs()
      finalizeReady(key, wmMs * 1000L, wmMs)
    }
  }
}
