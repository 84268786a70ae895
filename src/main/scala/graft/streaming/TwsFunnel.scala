package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming conversion funnel: a per-key ordered state machine
  * view → click → purchase maintained live in keyed state — the
  * product-analytics twin of the batch `q_funnel` aggregation, and the
  * canonical "ordered progression" shape any per-entity milestone
  * tracker takes (signup flows, order fulfilment stages, SLA
  * escalation ladders).
  *
  * Semantics (ORDER-INDEPENDENT given the per-key in-order contract
  * below): stage 1 opens at the key's FIRST view; stage 2 at the first
  * click with time STRICTLY after the stage-1 time; stage 3 at the
  * first purchase strictly after the stage-2 time. Strict progression
  * makes the result a pure function of the event multiset — an
  * equal-timestamp tie can never advance a stage, so batch tie-order
  * can't change the outcome (the property the oracle's min-over-filter
  * SQL replays exactly).
  *
  * Each micro-batch emits ONE row per touched key with the state
  * AFTER the batch — a funnel-progress changelog (Append mode; a
  * warehouse keeps the latest row per key). State per key is one
  * 4-field struct, constant-size.
  *
  * Ordering contract: rows sort by (us, event_id) within a batch;
  * per-key event time must not regress ACROSS batches (the Kafka
  * per-partition guarantee — same contract as [[TwsScd2]]). The
  * per-key batch buffer is bounded by admission control exactly as
  * documented there; TwsFunnelSpec pins multi-batch progression.
  */
object TwsFunnel {

  /** One input event: key, event time (epoch-µs), tiebreak id, type. */
  final case class FunnelEvent(user_id: Long, us: Long, event_id: Long,
      event_type: String)

  /** Keyed state: highest stage reached + the stage timestamps. */
  final case class FunnelState(stage: Long, vUs: Long, cUs: Long, pUs: Long)

  /** One output row per key per batch: funnel progress after the
    * batch (stage 0 = touched but no view yet). */
  final case class FunnelRow(user_id: Long, stage: Long,
      v_us: Option[Long], c_us: Option[Long], p_us: Option[Long])

  def funnelStream(events: DataFrame): Dataset[FunnelRow] = {
    implicit val outEnc = Encoders.product[FunnelRow]
    implicit val keyEnc = Encoders.scalaLong
    events.as[FunnelEvent](Encoders.product[FunnelEvent])
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor, TimeMode.None(),
        OutputMode.Append())
  }

  private final class FunnelProcessor
      extends StatefulProcessor[Long, FunnelEvent, FunnelRow] {

    @transient private var st: ValueState[FunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[FunnelState]("funnel",
        Encoders.product[FunnelState], TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[FunnelEvent],
        timerValues: TimerValues): Iterator[FunnelRow] = {
      val ordered = rows.toArray.sortBy(r => (r.us, r.event_id))
      var s = if (st.exists()) st.get() else FunnelState(0L, -1L, -1L, -1L)
      ordered.foreach { r =>
        s = (s.stage, r.event_type) match {
          case (0L, "view") => FunnelState(1L, r.us, -1L, -1L)
          case (1L, "click") if r.us > s.vUs => s.copy(stage = 2L, cUs = r.us)
          case (2L, "purchase") if r.us > s.cUs => s.copy(stage = 3L, pUs = r.us)
          case _ => s
        }
      }
      st.update(s)
      def opt(v: Long) = if (v < 0) None else Some(v)
      Iterator.single(FunnelRow(key, s.stage, opt(s.vUs), opt(s.cUs), opt(s.pUs)))
    }
  }
}
