package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming z-score anomaly detection on `transformWithState` —
  * each key's running mean/variance lives in ValueState (Welford's
  * sufficient statistics: count, sum, sum-of-squares — THREE longs per
  * key forever), and a row whose squared deviation exceeds k² times
  * the variance of everything seen BEFORE it flags, exactly once,
  * append-only. The monitoring primitive a pipeline bolts onto any
  * metric stream: no training pass, no model table, state O(keys).
  *
  * INTEGER-EXACT flagging, so a batch SQL replay agrees row-for-row:
  * values pre-scale to integer units (cents here — the caller picks
  * the scale), and the test `z² > k²` cross-multiplies to
  * `(n·x − s)² > k²·(n·q − s²)` — no division, no sqrt, no float.
  * The comparison runs in BigInt (HUGEINT in the oracle): n·x and the
  * sums individually fit a long under the documented input bound
  * (|x| ≤ 2³¹), but their squares need 128 bits. A zero-variance
  * history flags ANY deviation (RHS = 0) — correct limit behavior.
  *
  * Ordering contract = [[TwsScd2]]'s: per-key offsets must not regress
  * across batches; rows inside a batch sort by offset before the fold
  * (bounded by per-key arrivals within one trigger — admission
  * control, see TwsScd2.handleInputRows); stale rows (offset ≤ the
  * state's last-seen) drop rather than re-flagging history.
  *
  * The first `minN` rows per key never flag (no stable baseline) but
  * DO enter the statistics — the standard warm-up contract.
  */
object TwsAnomaly {

  /** One metric observation: key, monotone offset, pre-scaled value. */
  case class Obs(key: Long, offset: Long, x: Long)

  /** A flagged anomaly: `x` deviated > k·σ from the mean of the
    * `n_prior` observations before it. */
  case class Anomaly(key: Long, offset: Long, x: Long, n_prior: Long)

  /** Running sufficient statistics + the cross-batch ordering guard. */
  case class Stats(n: Long, s: Long, q: Long, lastOff: Long)

  /** Anomaly stream; run with `OutputMode.Append` — every flag is
    * final when emitted. `k` is the z-score threshold (integer — the
    * cross-multiplied test needs k² exact). */
  def anomalyStream(obs: DataFrame, k: Int, minN: Int): Dataset[Anomaly] = {
    implicit val outEnc = Encoders.product[Anomaly]
    implicit val keyEnc = Encoders.scalaLong
    obs.as[Obs](Encoders.product[Obs])
      .groupByKey(_.key)
      .transformWithState(new AnomalyProcessor(k, minN), TimeMode.None(),
        OutputMode.Append())
  }

  private final class AnomalyProcessor(k: Int, minN: Int)
      extends StatefulProcessor[Long, Obs, Anomaly] {

    @transient private var stats: ValueState[Stats] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      stats = getHandle.getValueState[Stats]("stats",
        Encoders.product[Stats], TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[Obs],
        timerValues: TimerValues): Iterator[Anomaly] = {
      val ordered = rows.toArray.sortBy(_.offset)
      val out = Seq.newBuilder[Anomaly]
      var st = if (stats.exists()) stats.get() else Stats(0L, 0L, 0L, Long.MinValue)
      val k2 = BigInt(k.toLong * k)
      ordered.foreach { r =>
        if (r.offset > st.lastOff) {
          if (st.n >= minN) {
            val lhs = (BigInt(st.n) * r.x - st.s).pow(2)
            val rhs = k2 * (BigInt(st.n) * st.q - BigInt(st.s) * st.s)
            if (lhs > rhs) out += Anomaly(key, r.offset, r.x, st.n)
          }
          st = Stats(st.n + 1L, st.s + r.x, st.q + r.x * r.x, r.offset)
        }
      }
      stats.update(st)
      out.result().iterator
    }
  }
}
