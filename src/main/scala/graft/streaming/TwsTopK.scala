package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Running top-k per key on `transformWithState` LIST state — the
  * third state-variable face (ValueState: TwsCompaction/TwsScd2,
  * MapState: TwsSourceStats). State per key is the current top-k
  * entries, k rows, re-emitted whenever the batch changes it, with a
  * per-key version counter so a reader takes max(ver) per key for the
  * current leaderboard (and older versions ARE the leaderboard's
  * history). Everything below the top-k is discarded on arrival —
  * state and output are O(k · keys) regardless of stream length.
  *
  * One board row per id: a re-scored id keeps its BEST observation
  * (top-k over all observations — the batch aggregate's semantic;
  * latest-per-id top-k is the compose of TwsCompaction then this).
  *
  * The batch twin is the `TopKByScore` aggregate; the stream answers
  * the same question continuously without re-scanning the corpus.
  */
object TwsTopK {

  /** Input: key + (score, id). */
  case class Scored(key: String, score: Long, id: Long)

  /** One leaderboard row: rank 1..k as of per-key version `ver`. */
  case class RankedEntry(key: String, ver: Long, rank: Int,
      id: Long, score: Long)

  /** Per-key version counter (public: encoder codegen needs it). */
  case class Meta(ver: Long)

  /** Run with `OutputMode.Update`: each batch that changes a key's
    * top-k emits the full new leaderboard under a bumped version. */
  def topKStream(rows: DataFrame, k: Int): Dataset[RankedEntry] = {
    implicit val outEnc = Encoders.product[RankedEntry]
    implicit val keyEnc = Encoders.STRING
    rows.as[Scored](Encoders.product[Scored])
      .groupByKey(_.key)
      .transformWithState(new TopKProcessor(k), TimeMode.None(),
        OutputMode.Update())
  }

  private final class TopKProcessor(k: Int)
      extends StatefulProcessor[String, Scored, RankedEntry] {

    @transient private var entries: ListState[Scored] = _
    @transient private var meta: org.apache.spark.sql.streaming.ValueState[Meta] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      entries = getHandle.getListState[Scored]("topk",
        Encoders.product[Scored], TTLConfig.NONE)
      meta = getHandle.getValueState[Meta]("meta",
        Encoders.product[Meta], TTLConfig.NONE)
    }

    // (score desc, id asc): the same total order as TopKByScore
    private def better(a: Scored, b: Scored): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)

    override def handleInputRows(
        key: String,
        rows: Iterator[Scored],
        timerValues: TimerValues): Iterator[RankedEntry] = {
      val prior = entries.get().toSeq
      // one entry per id — a re-scored id keeps its BEST entry (so the
      // board never shows the same id twice); exact replays collapse
      // in the same pass
      val merged = (prior ++ rows)
        .groupBy(_.id).valuesIterator
        .map(_.reduce((a, b) => if (better(a, b)) a else b))
        .toSeq
        .sortWith(better)
        .take(k)
      if (merged == prior) Iterator.empty
      else {
        entries.clear()
        entries.appendList(merged.toArray)
        val ver = (if (meta.exists()) meta.get().ver else 0L) + 1L
        meta.update(Meta(ver))
        merged.iterator.zipWithIndex.map { case (e, i) =>
          RankedEntry(key, ver, i + 1, e.id, e.score)
        }
      }
    }
  }
}
