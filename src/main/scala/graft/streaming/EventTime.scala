package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with watermark-bounded state — the
  * Structured Streaming shape for time-series rollups over an
  * unbounded stream.
  *
  * Scale reasoning: the watermark is what makes this run forever on a
  * cluster — without it, windowed state grows monotonically; with it,
  * Spark finalizes and EVICTS every window older than
  * (max event time − delay), so state is bounded by (delay / window)
  * windows per key regardless of stream length. Late rows behind the
  * watermark are dropped deterministically (counted in
  * `streamingQuery.lastProgress.stateOperators.numRowsDroppedByWatermark`).
  *
  * The same plan runs in batch mode (watermark is a no-op there), so
  * one definition serves the Lambda-free batch/stream parity the
  * reference's changelog model implies (topic/KafkaTopic.java is the
  * reference's only time axis — log offsets; event-time windows are
  * the generalization Spark adds).
  */
object EventTime {

  /** Tumbling event-time counts per key.
    *
    * @param events         input (streaming or batch) DataFrame
    * @param tsCol          TimestampType event-time column
    * @param keyCol         grouping key column
    * @param windowLen      e.g. "10 seconds"
    * @param watermarkDelay max tolerated lateness, e.g. "5 seconds"
    * @return (win_start, win_end, key, n) — in streaming append mode a
    *         window emits exactly once, when the watermark passes its
    *         end
    */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowLen: String,
      watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col(keyCol), col("n"))
}
