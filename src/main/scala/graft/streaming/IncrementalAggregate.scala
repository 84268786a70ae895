package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Ckpt.CkptOps

/** Incrementally maintained GROUPED AGGREGATE over a keyed changelog —
  * the aggregation face of the IVM engine's set-at-a-time model: where
  * [[IncrementalDenormalizer]] maintains joined documents under
  * upserts and tombstones, this maintains `GROUP BY g → (count, sum)`
  * rollups under the same changelog contract (latest-per-key wins,
  * null value = delete), with RETRACTION — an update that moves a key
  * from group A to group B subtracts its old contribution from A and
  * adds the new one to B, so the rollup always equals the aggregate
  * of the compacted latest state without ever rescanning it.
  *
  * Why this shape at 100 TB: the naive alternative recomputes the
  * aggregate from the full latest state every batch — O(|state|) per
  * batch forever. Here each batch costs O(|delta|): compact the batch
  * per key (one keyed aggregate of the batch only), one keyed join
  * against latest state to fetch old contributions, a ±delta
  * aggregate over ≤ 2·|delta| rows, and a merge into the (tiny,
  * ≤ |groups|) rollup table. Count and sum are self-inverse under
  * retraction; the same frame carries exact DECIMAL sums so
  * retraction is lossless (float retraction would drift). Extending
  * to min/max needs per-group heaps (not self-inverse) — out of
  * scope, documented here deliberately.
  *
  * State maintenance mirrors the engine: both frames re-checkpoint
  * per batch (lineage truncation); in deployment the latest-state
  * table rides the bucketed durable backend exactly like the
  * engine's index tables ([[StateBackend]]), making the state-side
  * join Exchange-free — the in-memory form here keeps the operator
  * self-contained.
  *
  * Changelog schema: (k LONG, offset LONG, g STRING, v DECIMAL) —
  * g AND v null ⇒ tombstone for k. Offsets are unique per key and
  * define recency (the reference's log-offset time model).
  */
object IncrementalAggregate {

  /** Rollup sum type: wide enough that merging never re-widens. */
  val sumType: DecimalType = DecimalType(30, 2)

  /** latest: (k, g, v) one row per live key; agg: (g, cnt, s). */
  final case class State(latest: DataFrame, agg: DataFrame)

  def empty(spark: SparkSession): State = {
    import spark.implicits._
    val latest = Seq.empty[(Long, String, java.math.BigDecimal)]
      .toDF("k", "g", "v")
      .select(col("k"), col("g"), col("v").cast(DecimalType(18, 2)))
    val agg = Seq.empty[(String, Long, java.math.BigDecimal)]
      .toDF("g", "cnt", "s")
      .select(col("g"), col("cnt"), col("s").cast(sumType))
    State(latest, agg)
  }

  /** Per-key compaction of ONE batch: the row with the max offset wins
    * (offsets are unique per key, so the struct max is decided by its
    * first field and never compares the nullable payload). */
  private def compactBatch(changes: DataFrame): DataFrame =
    changes.groupBy("k")
      .agg(max(struct(col("offset"), col("g"), col("v"))).as("__m"))
      .select(col("k"), col("__m.g").as("g_new"), col("__m.v").as("v_new"))

  /** The ±contribution rows for one compacted batch against the
    * current latest state: −(old g, old v) for every key that had
    * state, +(new g, new v) for every non-tombstone. Exposed for the
    * spec to pin the O(|delta|) contract (only touched groups appear). */
  private[graft] def batchDeltas(
      latest: DataFrame, compacted: DataFrame): DataFrame = {
    val j = compacted.join(
        latest.select(col("k"), col("g").as("g_old"), col("v").as("v_old")),
        Seq("k"), "left")
      .graftCkptMem()
    val retract = j.where(col("g_old").isNotNull)
      .select(col("g_old").as("g"), lit(-1L).as("dc"), (-col("v_old")).as("dv"))
    val add = j.where(col("g_new").isNotNull)
      .select(col("g_new").as("g"), lit(1L).as("dc"), col("v_new").as("dv"))
    retract.unionByName(add)
      .groupBy("g")
      .agg(sum(col("dc")).as("dc"), sum(col("dv")).cast(sumType).as("dv"))
  }

  /** Fold one changelog batch into the state. Work ∝ batch size plus
    * the rollup merge (≤ |groups| rows); the latest-state upsert is
    * the same anti-join + union fold the engine's snapshot tables use. */
  def applyBatch(state: State, changes: DataFrame): State = {
    val cc = compactBatch(changes).graftCkptMem()
    val dAgg = batchDeltas(state.latest, cc)
    val mergedAgg = state.agg.join(dAgg, Seq("g"), "full_outer")
      .select(col("g"),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("dc"), lit(0L))).as("cnt"),
        (coalesce(col("s"), lit(0).cast(sumType)) +
          coalesce(col("dv"), lit(0).cast(sumType))).cast(sumType).as("s"))
      .where(col("cnt") > 0)
    val survivors = state.latest.join(cc.select("k"), Seq("k"), "left_anti")
    val upserts = cc.where(col("g_new").isNotNull)
      .select(col("k"), col("g_new").as("g"), col("v_new").as("v"))
    State(survivors.unionByName(upserts).graftCkptMem(),
      mergedAgg.graftCkptMem())
  }

  /** The from-scratch aggregate of the latest state — the invariant
    * the maintained rollup must equal after every batch (spec + the
    * q_incr_agg oracle check it). */
  def recompute(latest: DataFrame): DataFrame =
    latest.groupBy("g")
      .agg(count(lit(1)).as("cnt"), sum(col("v")).cast(sumType).as("s"))
}
