package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming last-touch attribution: the live twin of the batch
  * `q_attribution` as-of join. Per user the state is ONE tiny pair —
  * the latest click's timestamp and the best (max) campaign seen at
  * exactly that timestamp — and every purchase is credited AT ARRIVAL
  * to that state (campaign −1 when no click precedes it). This is the
  * canonical "enrich the fact stream against slowly-updating keyed
  * context" processor: the batch pipeline needs the full click history
  * to replay the as-of join; the stream needs O(1) state per user and
  * emits each credit exactly once (Append mode).
  *
  * ASOF `>=` tie parity: the batch oracle credits a click at the SAME
  * microsecond as the purchase, so within a batch the processor orders
  * clicks before purchases at an equal timestamp ((us, isPurchase,
  * event_id) sort — the same replayable-tie discipline as
  * [[TwsFunnel]]'s strict progression). Clicks with a NULL campaign
  * still become the latest click (crediting −1), exactly like the
  * oracle's `coalesce(max(k), -1)` over the (user, time) click group.
  *
  * Ordering contract: per-key event time must not regress across
  * batches (Kafka per-partition guarantee; same contract as
  * [[TwsScd2]]), and an equal-microsecond click/purchase pair must
  * co-batch for the tie rule to see it — under `Trigger.AvailableNow`
  * (one batch) both hold trivially. Per-key batch buffers are bounded
  * by admission control as documented in TwsScd2.
  */
object TwsAttribution {

  /** One input event. `k` = campaign (clicks; None when the click
    * carries no campaign), `cents` = exact revenue (purchases). */
  final case class AttrEvent(user_id: Long, us: Long, event_id: Long,
      event_type: String, k: Option[Long], cents: Option[Long])

  /** Keyed state: latest click time + best campaign at that time. */
  final case class ClickState(ct: Long, k: Option[Long])

  /** One output row per credited purchase. */
  final case class CreditRow(purchase_id: Long, user_id: Long,
      campaign: Long, cents: Long)

  def attributionStream(events: DataFrame): Dataset[CreditRow] = {
    implicit val outEnc = Encoders.product[CreditRow]
    implicit val keyEnc = Encoders.scalaLong
    events.as[AttrEvent](Encoders.product[AttrEvent])
      .groupByKey(_.user_id)
      .transformWithState(new AttributionProcessor, TimeMode.None(),
        OutputMode.Append())
  }

  private final class AttributionProcessor
      extends StatefulProcessor[Long, AttrEvent, CreditRow] {

    @transient private var st: ValueState[ClickState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[ClickState]("last_click",
        Encoders.product[ClickState], TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[AttrEvent],
        timerValues: TimerValues): Iterator[CreditRow] = {
      // clicks before purchases at an equal microsecond — ASOF >=
      val ordered = rows.toArray
        .sortBy(r => (r.us, r.event_type == "purchase", r.event_id))
      var s = if (st.exists()) st.get() else ClickState(-1L, None)
      val out = Array.newBuilder[CreditRow]
      ordered.foreach { r =>
        r.event_type match {
          case "click" =>
            s =
              if (r.us > s.ct) ClickState(r.us, r.k)
              else if (r.us == s.ct)
                ClickState(s.ct, (s.k ++ r.k).reduceOption(_ max _))
              else s
          case "purchase" =>
            val campaign =
              if (s.ct >= 0 && s.ct <= r.us) s.k.getOrElse(-1L) else -1L
            out += CreditRow(r.event_id, key, campaign, r.cents.getOrElse(0L))
          case _ => ()
        }
      }
      st.update(s)
      out.result().iterator
    }
  }
}
