package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming z-score anomaly detection on `transformWithState` —
  * each key's running mean/variance lives in ValueState (Welford's
  * sufficient statistics: count, sum, 128-bit sum-of-squares — FOUR
  * longs per key forever), and a row whose squared deviation exceeds k² times
  * the variance of everything seen BEFORE it flags, exactly once,
  * append-only. The monitoring primitive a pipeline bolts onto any
  * metric stream: no training pass, no model table, state O(keys).
  *
  * INTEGER-EXACT flagging, so a batch SQL replay agrees row-for-row:
  * values pre-scale to integer units (cents here — the caller picks
  * the scale), and the test `z² > k²` cross-multiplies to
  * `(n·x − s)² > k²·(n·q − s²)` — no division, no sqrt, no float.
  * The comparison runs in BigInt (HUGEINT in the oracle). Under the
  * documented input bound (|x| ≤ 2³¹) each x² fits a long, but the
  * RUNNING sum of squares does not — two rows near the bound already
  * exceed 2⁶³ — so `q` accumulates as a hi/lo pair of longs (value =
  * qHi·2⁶² + qLo, 0 ≤ qLo < 2⁶²): exact to 2¹²⁵, carried in the
  * fixed-width state row a state store can encode (no variable-width
  * BigInt in state, no precision-losing Decimal encoder). `s` stays a
  * plain long — |s| ≤ n·2³¹ holds to n < 2³² rows per key, far past
  * any per-key stream this monitors. A zero-variance history flags
  * ANY deviation (RHS = 0) — correct limit behavior.
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

  /** Running sufficient statistics + the cross-batch ordering guard.
    * The sum of squares is 126-bit: `qHi`·2⁶² + `qLo` (invariant
    * 0 ≤ qLo < 2⁶², so adding one x² ≤ 2⁶² carries at most 1).
    *
    * STATE-SCHEMA VERSIONING: this row is the processor's durable
    * checkpoint layout. The qHi/qLo split changed it from 4 to 5
    * fields, so the ValueState is registered under a VERSIONED name
    * ("statsV2" below) — a restart against a checkpoint written by the
    * 4-field release finds no state under the new name and fails
    * Spark's state-schema compatibility check loudly instead of
    * misreading 4-field rows as 5-field ones. Operational contract:
    * changing this case class means bumping the state name and
    * discarding (or batch-migrating) existing anomaly-stream
    * checkpoints — there is no in-place migration. */
  case class Stats(n: Long, s: Long, qHi: Long, qLo: Long, lastOff: Long)

  private val QBase = 1L << 62

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
      stats = getHandle.getValueState[Stats]("statsV2",
        Encoders.product[Stats], TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[Obs],
        timerValues: TimerValues): Iterator[Anomaly] = {
      val ordered = rows.toArray.sortBy(_.offset)
      val out = Seq.newBuilder[Anomaly]
      var st =
        if (stats.exists()) stats.get() else Stats(0L, 0L, 0L, 0L, Long.MinValue)
      val k2 = BigInt(k.toLong * k)
      ordered.foreach { r =>
        require(math.abs(r.x) <= (1L << 31),
          s"TwsAnomaly input bound |x| <= 2^31 violated: ${r.x}")
        if (r.offset > st.lastOff) {
          if (st.n >= minN) {
            val q = (BigInt(st.qHi) << 62) + st.qLo
            val lhs = (BigInt(st.n) * r.x - st.s).pow(2)
            val rhs = k2 * (BigInt(st.n) * q - BigInt(st.s) * st.s)
            if (lhs > rhs) out += Anomaly(key, r.offset, r.x, st.n)
          }
          val x2 = r.x * r.x // exact: |x| <= 2^31 so x^2 <= 2^62
          val lo = st.qLo + x2 - (if (st.qLo + x2 >= QBase) QBase else 0L)
          val hi = st.qHi + (if (st.qLo + x2 >= QBase) 1L else 0L)
          st = Stats(st.n + 1L, st.s + r.x, hi, lo, r.offset)
        }
      }
      stats.update(st)
      out.result().iterator
    }
  }
}
