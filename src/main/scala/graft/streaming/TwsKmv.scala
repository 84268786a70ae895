package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Running distinct-count estimation per key: the KMV sketch AS the
  * streaming state. Mergeability is what makes a sketch the right
  * state representation — each batch's hashes fold into the k-array in
  * O(k + batch) and the state stays k longs per key FOREVER, where
  * exact streaming distinct (StreamingDedup's per-hash entries) grows
  * with the distinct count itself. The estimator is the batch twin's
  * exactly ((k−1)·2⁵²/h_k, integer division — TextAnalysis.kmvDistinct),
  * so a single-batch run reproduces the batch query bit-for-bit.
  *
  * Hashes are computed by the CODEGEN'd hash52 projection BEFORE the
  * stateful operator — the processor never touches strings.
  */
object TwsKmv {

  /** Input: key + 52-bit hash (TextAnalysis.hash52 of the value). */
  case class Hashed(key: String, h: Long)

  /** Running estimate as of per-key version `ver`. */
  case class Estimate(key: String, ver: Long, kmv_distinct: Long,
      kmv_size: Long)

  /** Sketch state: ascending k-min distinct hashes + version. */
  case class Sketch(hs: Array[Long], ver: Long)

  /** Run with `OutputMode.Update`: a batch that changes a key's sketch
    * emits the new estimate under a bumped version. */
  def distinctStream(rows: DataFrame, k: Int): Dataset[Estimate] = {
    implicit val outEnc = Encoders.product[Estimate]
    implicit val keyEnc = Encoders.STRING
    rows.as[Hashed](Encoders.product[Hashed])
      .groupByKey(_.key)
      .transformWithState(new KmvProcessor(k), TimeMode.None(),
        OutputMode.Update())
  }

  private[streaming] def estimate(hs: Array[Long], k: Int): Long =
    if (hs.length < k) hs.length.toLong
    else ((k - 1).toLong << 52) / math.max(hs(k - 1), 1L)

  private final class KmvProcessor(k: Int)
      extends StatefulProcessor[String, Hashed, Estimate] {

    @transient private var sketch: ValueState[Sketch] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sketch = getHandle.getValueState[Sketch]("kmv",
        Encoders.product[Sketch], TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[Hashed],
        timerValues: TimerValues): Iterator[Estimate] = {
      val prior = if (sketch.exists()) sketch.get() else Sketch(Array.empty, 0L)
      // cheap pre-cut: anything above the current k-th minimum can
      // never enter a FULL sketch
      val cut = if (prior.hs.length >= k) prior.hs(k - 1) else Long.MaxValue
      val fresh = rows.map(_.h).filter(_ <= cut).toArray
      val merged = (prior.hs ++ fresh).distinct.sorted.take(k)
      if (java.util.Arrays.equals(merged, prior.hs)) Iterator.empty
      else {
        val ver = prior.ver + 1L
        sketch.update(Sketch(merged, ver))
        Iterator.single(
          Estimate(key, ver, estimate(merged, k), merged.length.toLong))
      }
    }
  }
}
