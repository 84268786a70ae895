package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Running per-source corpus composition on `transformWithState` with
  * MAP state — live ingestion statistics (how many documents of each
  * language has each source contributed so far?), the monitoring
  * counter every corpus-ingest pipeline keeps next to its data path.
  *
  * The point of the operator in this codebase: it exercises the LAST
  * state primitive of the Spark 4 arbitrary-state API surface —
  * [[TwsCompaction]] covers typed ValueState, [[TwsSessions]] covers
  * ListState + event-time timers, this covers `MapState`: one state
  * ROW per (key, map-entry) in the store, so a source's per-language
  * counters grow and are read/updated ENTRY-wise — point lookups and
  * point writes per batch, never a full-map deserialize/reserialize
  * per arrival, which is exactly why MapState exists instead of a
  * ValueState[Map[...]] (whose every update rewrites the whole map —
  * quadratic bytes for a growing map under an endless stream).
  *
  * Per batch a key emits ONE updated running total per language it
  * touched (`OutputMode.Update`); batch arrivals fold map-side into a
  * per-batch delta first, so state I/O per batch is ∝ distinct
  * (source, lang) pairs touched, not rows. Emission order within a
  * key is lang-sorted for determinism. Runs in `TimeMode.None` on the
  * RocksDB provider, same as [[TwsCompaction]].
  */
object TwsSourceStats {

  /** One input document's composition-relevant fields. */
  final case class DocMeta(source: String, lang: String)

  /** A running total: `n` documents of `lang` seen from `source`. */
  final case class SourceLangCount(source: String, lang: String, n: Long)

  def countsStream(docs: DataFrame): Dataset[SourceLangCount] = {
    implicit val outEnc = Encoders.product[SourceLangCount]
    docs.as[DocMeta](Encoders.product[DocMeta])
      .groupByKey(_.source)(Encoders.STRING)
      .transformWithState(new CountsProcessor, TimeMode.None(),
        OutputMode.Update())
  }

  private final class CountsProcessor
      extends StatefulProcessor[String, DocMeta, SourceLangCount] {

    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: String, rows: Iterator[DocMeta],
        timerValues: TimerValues): Iterator[SourceLangCount] = {
      val delta = rows.foldLeft(Map.empty[String, Long]) { (m, r) =>
        m.updated(r.lang, m.getOrElse(r.lang, 0L) + 1L)
      }
      delta.toSeq.sortBy(_._1).map { case (lang, d) =>
        val n = (if (counts.containsKey(lang)) counts.getValue(lang) else 0L) + d
        counts.updateValue(lang, n)
        SourceLangCount(key, lang, n)
      }.iterator
    }
  }
}
