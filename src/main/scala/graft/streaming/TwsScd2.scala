package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming SCD Type 2 maintenance: the incremental twin of
  * `Temporal.scd2`. The batch operator compiles a FULL changelog into
  * validity intervals with two window passes; this one maintains the
  * same version table live — keyed state holds each key's OPEN version
  * and every attribute change emits the version it CLOSES, exactly
  * once, as an immutable append-only row. A warehouse tails the closed
  * stream and unions the in-state opens for point-in-time reads (the
  * reference keeps only the open state — latest-per-key,
  * topic/KafkaTopic.java:193-205; the closed stream is the history it
  * throws away).
  *
  * Ordering contract: per-key offsets must not regress ACROSS batches
  * (Kafka's per-partition guarantee — the same assumption the
  * reference makes); rows inside a batch sort by offset before the
  * fold, and a cross-batch stale row (offset ≤ the open version's
  * last-seen offset) is dropped rather than rewriting emitted history.
  *
  * State per key is ONE open version (attr, valid_from, last offset) —
  * constant-size, unlike the batch window that re-sorts the entire
  * history each run. `TimeMode.None`: the clock is the offset order
  * (see TwsCompaction's scaladoc on why wall-clock TTL is the wrong
  * profile for a log-offset changelog).
  */
object TwsScd2 {

  /** One changelog row: key, monotone offset, tracked attribute. */
  case class AttrChange(key: Long, offset: Long, attr: String)

  /** A CLOSED version: `attr` held on [valid_from, valid_to). */
  case class ClosedVersion(key: Long, attr: String,
      valid_from: Long, valid_to: Long)

  /** The open version carried in state. */
  case class OpenVersion(attr: String, validFrom: Long, lastOff: Long)

  /** Closed-version stream; run with `OutputMode.Append` — each output
    * row is final the moment it is emitted. */
  def versionStream(changes: DataFrame): Dataset[ClosedVersion] = {
    implicit val outEnc = Encoders.product[ClosedVersion]
    implicit val keyEnc = Encoders.scalaLong
    changes.as[AttrChange](Encoders.product[AttrChange])
      .groupByKey(_.key)
      .transformWithState(new Scd2Processor, TimeMode.None(),
        OutputMode.Append())
  }

  private final class Scd2Processor
      extends StatefulProcessor[Long, AttrChange, ClosedVersion] {

    @transient private var open: ValueState[OpenVersion] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenVersion]("open",
        Encoders.product[OpenVersion], TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[AttrChange],
        timerValues: TimerValues): Iterator[ClosedVersion] = {
      // The sort buffers ONE key's rows from ONE micro-batch — unlike
      // latest-per-key (TwsCompaction, order-free fold), version
      // closing is order-DEPENDENT, so the rows must sort before the
      // fold. The buffer is bounded by per-key arrivals within a
      // single trigger: admission control (maxOffsetsPerTrigger /
      // maxFilesPerTrigger) is the documented contract that keeps a
      // hot key's batch slice in task memory — the reference is a
      // single-threaded per-record loop and has the identical bound.
      // TwsScd2Spec pins a 100k-row single-key batch through here.
      val ordered = rows.toArray.sortBy(_.offset)
      val closed = Seq.newBuilder[ClosedVersion]
      var cur = if (open.exists()) Option(open.get()) else None
      ordered.foreach { r =>
        cur match {
          case None =>
            cur = Some(OpenVersion(r.attr, r.offset, r.offset))
          case Some(o) if r.offset <= o.lastOff => // cross-batch stale row
          case Some(o) if o.attr == r.attr =>
            cur = Some(o.copy(lastOff = r.offset))
          case Some(o) =>
            closed += ClosedVersion(key, o.attr, o.validFrom, r.offset)
            cur = Some(OpenVersion(r.attr, r.offset, r.offset))
        }
      }
      cur.foreach(open.update)
      closed.result().iterator
    }
  }
}
