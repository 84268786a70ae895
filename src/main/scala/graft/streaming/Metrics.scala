package graft.streaming

import com.codahale.metrics.{Gauge, MetricRegistry}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Engine metrics reporter — the reference's Dropwizard registry
  * (reference: metric/Metrics.java:27-160, names under `jw.southpaw`)
  * re-expressed over Structured Streaming's listener bus.
  *
  * The engine accumulates its counters job-free from `observe` metrics
  * riding each batch's own materializations (Incremental.scala); this
  * listener publishes them two ways:
  *
  *  - a [[registry]] of live Dropwizard gauges under reference-style
  *    dotted names (`graft.records.consumed`, …) — attach any
  *    `com.codahale.metrics` reporter (JMX, console, graphite) exactly
  *    as the reference's JmxReporter does (Metrics.java:50-56);
  *  - [[reported]], the counter snapshot taken at each micro-batch's
  *    QueryProgressEvent — the per-batch reporting cadence of the
  *    reference's `metrics.report.time.s` loop (Southpaw.java:483-487).
  */
final class EngineMetricsListener(
    engine: IncrementalDenormalizer,
    prefix: String = "graft") extends StreamingQueryListener {

  /** engine counter key → reference metric name (Metrics.java:28-41). */
  private val nameMap = Map(
    "records_consumed" -> "records.consumed",
    "docs_written" -> "denormalized.records.created",
    "rebuilds_dropped_none" -> "denormalized.records.dropped",
    "docs_tombstoned" -> "denormalized.records.tombstoned",
    "delta_keys" -> "records.delta.keys",
    "batches" -> "batches.processed")

  private def metricName(key: String): String =
    s"$prefix.${nameMap.getOrElse(key, key.replace('_', '.'))}"

  /** Live gauges over the engine's counters. */
  val registry: MetricRegistry = new MetricRegistry()
  engine.counters.keys.foreach { k =>
    registry.register(metricName(k), new Gauge[Long] {
      override def getValue: Long = engine.counters.getOrElse(k, 0L)
    })
  }

  /** Counter snapshot as of the last completed micro-batch, under
    * reported metric names. */
  @volatile var reported: Map[String, Long] = Map.empty

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
    reported = engine.counters.map { case (k, v) => metricName(k) -> v }
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
}
