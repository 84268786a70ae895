package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming grouped quantiles with a HISTOGRAM SKETCH as keyed state —
  * the live twin of the batch `q_quantile_sketch` (same 1000-unit
  * bins, same ceil-rank upper-bound estimator, same pure-BIGINT
  * arithmetic), maintaining per-group percentiles over an unbounded
  * value stream.
  *
  * Why a histogram in MapState and not a value buffer: exact streaming
  * percentiles would buffer every value per key forever. The histogram
  * is one state ROW per occupied (key, bin) — bounded by the value
  * DOMAIN (~a hundred bins for a price column), independent of stream
  * length, and updates are entry-wise point writes (MapState's reason
  * to exist — see [[TwsSourceStats]]). Batch arrivals fold map-side
  * into a per-batch bin delta first, so state I/O per batch is
  * ∝ bins touched, not rows.
  *
  * Per batch each touched key re-emits its current (p50, p95, n)
  * estimate (`OutputMode.Update`): the emission scans the key's FULL
  * bin map — bounded by the bin count, the same reason the batch
  * twin's rank window over the histogram frame is safe. Estimator and
  * error contract are the batch twin's: bin upper bound at rank
  * ceil(q·n), error ≤ one bin width, bit-exact on any engine.
  */
object TwsQuantile {

  /** One observation: group key, value in exact cents. */
  final case class Obs(g: String, cents: Long)

  /** A group's current estimate: counts n, upper-bound p50/p95. */
  final case class QuantileRow(g: String, n: Long, p50_ub: Long, p95_ub: Long)

  /** Bin width in cents — size to the value domain (the batch twin's
    * 1000-currency-unit bins suit prices; a 0–500 metric wants finer).
    * Must divide by 100 exactly so bin upper bounds are whole units. */
  def quantileStream(obs: DataFrame,
      binCents: Long = 100000L): Dataset[QuantileRow] = {
    implicit val outEnc = Encoders.product[QuantileRow]
    require(binCents > 0 && binCents % 100 == 0)
    obs.as[Obs](Encoders.product[Obs])
      .groupByKey(_.g)(Encoders.STRING)
      .transformWithState(new QuantileProcessor(binCents), TimeMode.None(),
        OutputMode.Update())
  }

  private final class QuantileProcessor(binCents: Long)
      extends StatefulProcessor[String, Obs, QuantileRow] {

    @transient private var hist: MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      hist = getHandle.getMapState[Long, Long]("hist",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: String, rows: Iterator[Obs],
        timerValues: TimerValues): Iterator[QuantileRow] = {
      val delta = rows.foldLeft(Map.empty[Long, Long]) { (m, r) =>
        val bin = r.cents / binCents
        m.updated(bin, m.getOrElse(bin, 0L) + 1L)
      }
      delta.foreach { case (bin, d) =>
        hist.updateValue(bin,
          (if (hist.containsKey(bin)) hist.getValue(bin) else 0L) + d)
      }
      // readout: rank scan over this key's (bounded) bin map
      val bins = hist.iterator().map(p => (p._1, p._2)).toArray.sortBy(_._1)
      val n = bins.iterator.map(_._2).sum
      def ub(qNum: Long, qDen: Long): Long = {
        val target = (n * qNum + qDen - 1) / qDen // ceil(q·n)
        var cum = 0L
        var i = 0
        while (i < bins.length) {
          cum += bins(i)._2
          if (cum >= target) return (bins(i)._1 + 1) * (binCents / 100L)
          i += 1
        }
        (bins.last._1 + 1) * (binCents / 100L)
      }
      Iterator.single(QuantileRow(key, n, ub(50, 100), ub(95, 100)))
    }
  }
}
