package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Exact deduplication as a NATIVE Structured Streaming stateful
  * operator — the streaming analogue of the batch `q_dedup_exact`
  * group-by, for ingestion pipelines that must drop duplicate
  * documents as they arrive instead of re-scanning the corpus.
  *
  * Keyed by content hash (the caller supplies it — a fixed-width
  * digest like `sha2(text, 256)`, so state size is independent of
  * document length); state per hash is the canonical (first-seen)
  * doc id. Every arriving document emits one decision row: the first
  * occurrence is canonical (`dup_of` empty), later occurrences point
  * at the canonical id. "First" is arrival order across micro-batches
  * and (offset, doc_id) order within a batch — a streaming operator
  * cannot retract an already-emitted canonical choice, which is the
  * standard first-wins contract for streaming dedup (Spark's own
  * `dropDuplicates` behaves the same way).
  *
  * Scale shape: the state store is hash-partitioned by content hash
  * and holds one fixed-width entry per DISTINCT document — the same
  * asymptotics as the batch hash-group, but incremental and
  * checkpointed. For bounded state on endless streams,
  * [[firstSeenBounded]] swaps `NoTimeout` for an event-time timeout
  * (dedup-within-horizon), exactly like
  * `dropDuplicatesWithinWatermark`.
  */
object StreamingDedup {

  case class DocArrival(doc_id: Long, offset: Long, content_hash: String)
  case class DedupDecision(doc_id: Long, content_hash: String, dup_of: Option[Long])
  case class SeenState(canonical_id: Long)

  /** Dedup a stream of (doc_id, offset, content_hash) arrivals.
    * Run with `OutputMode.Append`. */
  def firstSeen(docs: DataFrame): Dataset[DedupDecision] = {
    implicit val outEnc = Encoders.product[DedupDecision]
    implicit val keyEnc = Encoders.STRING
    implicit val stateEnc = Encoders.product[SeenState]
    docs.as[DocArrival](Encoders.product[DocArrival])
      .groupByKey(_.content_hash)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(dedupGroup)
  }

  private[streaming] def dedupGroup(
      hash: String,
      rows: Iterator[DocArrival],
      state: GroupState[SeenState]): Iterator[DedupDecision] = {
    val ordered = rows.toSeq.sortBy(r => (r.offset, r.doc_id))
    var canon = state.getOption.map(_.canonical_id)
    val out = ordered.map { r =>
      canon match {
        case None =>
          canon = Some(r.doc_id)
          DedupDecision(r.doc_id, hash, None)
        case Some(c) =>
          DedupDecision(r.doc_id, hash, Some(c))
      }
    }
    canon.foreach(c => state.update(SeenState(c)))
    out.iterator
  }

  case class DocArrivalTs(
      doc_id: Long, offset: Long, content_hash: String, tstamp: Timestamp)

  /** Dedup-within-horizon — the bounded-state variant of [[firstSeen]]
    * and the `dropDuplicatesWithinWatermark` analogue: a copy arriving
    * within `horizon` of the last seen copy dedups against the
    * canonical id; once the WATERMARK passes (last copy's event time +
    * horizon) the hash's state EVICTS via `EventTimeTimeout`, and a
    * later copy starts a fresh canonical. That trades the unbounded
    * exactness of [[firstSeen]] (state per distinct hash, forever) for
    * state proportional to the hashes seen in the last horizon — the
    * only shape that runs forever on an endless stream whose distinct
    * count grows without bound.
    *
    * The timeout renews on every copy (last-seen + horizon, like a
    * session gap), so a hash that keeps re-arriving keeps deduping;
    * eviction needs a quiet horizon. Input needs an event-time column
    * `tstamp`; rows behind the watermark are dropped by the runtime
    * before they reach the operator (the standard late-data contract).
    * Run with `OutputMode.Append`. */
  def firstSeenBounded(
      docs: DataFrame,
      horizonMs: Long,
      watermarkDelay: String): Dataset[DedupDecision] = {
    implicit val outEnc = Encoders.product[DedupDecision]
    implicit val keyEnc = Encoders.STRING
    implicit val stateEnc = Encoders.product[SeenState]
    docs.withWatermark("tstamp", watermarkDelay)
      .as[DocArrivalTs](Encoders.product[DocArrivalTs])
      .groupByKey(_.content_hash)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        dedupGroupBounded(horizonMs))
  }

  private[streaming] def dedupGroupBounded(horizonMs: Long)(
      hash: String,
      rows: Iterator[DocArrivalTs],
      state: GroupState[SeenState]): Iterator[DedupDecision] = {
    if (state.hasTimedOut) {
      // watermark passed last-seen + horizon with no new copies: evict
      state.remove()
      Iterator.empty
    } else {
      val ordered = rows.toSeq.sortBy(r => (r.offset, r.doc_id))
      var canon = state.getOption.map(_.canonical_id)
      val out = ordered.map { r =>
        canon match {
          case None =>
            canon = Some(r.doc_id)
            DedupDecision(r.doc_id, hash, None)
          case Some(c) =>
            DedupDecision(r.doc_id, hash, Some(c))
        }
      }
      canon.foreach(c => state.update(SeenState(c)))
      // renew the horizon from the newest copy in this batch (admitted
      // rows are ahead of the watermark, so this timestamp always is too)
      if (ordered.nonEmpty)
        state.setTimeoutTimestamp(ordered.map(_.tstamp.getTime).max + horizonMs)
      out.iterator
    }
  }

  /** One LSH band-bucket membership row (Dedup.bandedSignaturesRowwise
    * output, renamed to carry the doc id). */
  case class BandHit(band: Int, bh: String, doc_id: Long)

  /** A near-dup screening hit: `doc_id` shares an LSH bucket with the
    * bucket's first-seen anchor. */
  case class LshDecision(doc_id: Long, dup_of: Long)

  /** Streaming NEAR-dup screening — MinHash/LSH lifted to arrival
    * time: the streaming face of the batch `q_dedup_minhash` candidate
    * machinery, for ingestion pipelines that must flag likely
    * duplicates as documents arrive. Input is the per-row banded
    * signature stream ([[graft.operators.Dedup.bandedSignaturesRowwise]]
    * — a pure projection, so the whole pipeline before the state store
    * is shuffle-free); state is ONE fixed-width entry per occupied
    * (band, bucket): the first-seen anchor doc. Every later arrival in
    * an occupied bucket emits (doc, anchor); a doc's final screening
    * verdict is min(anchor) over its bands (rolled up by the sink-side
    * consumer, `q_stream_dedup_lsh`).
    *
    * First-wins contract, same as [[firstSeen]]: the anchor is the
    * first ARRIVAL (ties within a batch break by doc id), never
    * retracted — so cross-batch, `dup_of` may exceed `doc_id`
    * (pinned in StreamingDedupSpec); single-batch arrival makes
    * first-seen == min(doc id), which is what the DuckDB oracle
    * replays. This is the candidate/screening stage only — the exact
    * verify (Jaccard on full gram sets) needs both documents' grams
    * and belongs to a downstream batch pass over flagged pairs, the
    * standard async-verify split for streaming near-dup.
    *
    * Scale shape: state is bounded by occupied buckets (≤ docs ×
    * bands, fixed width each), hash-partitioned by bucket key; a hot
    * bucket costs O(members) emissions total, never O(members²) pairs
    * — the same star shape as the batch `lshBucketEdges`. Run with
    * `OutputMode.Append`. */
  def lshScreen(bands: DataFrame): Dataset[LshDecision] = {
    implicit val outEnc = Encoders.product[LshDecision]
    implicit val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.STRING)
    implicit val stateEnc = Encoders.product[SeenState]
    bands.as[BandHit](Encoders.product[BandHit])
      .groupByKey(r => (r.band, r.bh))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(lshGroup)
  }

  private[streaming] def lshGroup(
      key: (Int, String),
      rows: Iterator[BandHit],
      state: GroupState[SeenState]): Iterator[LshDecision] = {
    val ids = rows.map(_.doc_id).toSeq.sorted
    val anchor = state.getOption.map(_.canonical_id).getOrElse(ids.head)
    if (!state.exists) state.update(SeenState(anchor))
    ids.filter(_ != anchor).map(d => LshDecision(d, anchor)).iterator
  }

  /** One band-bucket membership row with the doc's event time. */
  case class BandHitTs(band: Int, bh: String, doc_id: Long, tstamp: Timestamp)

  /** Horizon-bounded epoch state for one (band, bucket): the current
    * epoch's anchor and the last arrival's event time (the session-gap
    * renewal clock). */
  case class EpochState(canonical_id: Long, last_ms: Long)

  /** Streaming CLUSTER assignment within a horizon — the step real
    * ingestion pipelines want after [[lshScreen]]'s pair screening:
    * every arriving document is assigned a cluster id at ingest time,
    * where the cluster id is the FIRST-SEEN member (anchor) of the
    * LSH bucket epoch it lands in, and bucket epochs are bounded by a
    * session-gap horizon: a bucket quiet for more than `horizonMs`
    * (event time) closes its epoch — state EVICTS via
    * `EventTimeTimeout` once the watermark passes last-seen + horizon
    * — and the next arrival FOUNDS a new epoch (fresh anchor). Gap
    * splits are enforced inside the batch fold too (rows sorted by
    * event time per bucket), so the semantics are pure gap-epochs
    * regardless of how arrivals split into micro-batches.
    *
    * Every row (founders included, anchor = self) emits one
    * (doc, anchor) hit; the consumer's per-doc roll-up
    * `min(anchor) over the doc's bands` IS the cluster id —
    * one-hop assignment. Transitive merges across anchors remain the
    * periodic batch CC pass (`q_dup_clusters`); this operator's
    * contract is the standard streaming/batch split: immediate
    * bounded-state assignment now, exact closure offline.
    *
    * Scale shape: state is one fixed-width entry per bucket occupied
    * WITHIN the horizon (the only shape that runs forever on an
    * endless stream), hash-partitioned by bucket key; a hot bucket
    * costs O(members) emissions, never O(members²). Run with
    * `OutputMode.Append`. */
  def lshScreenBounded(
      bands: DataFrame,
      horizonMs: Long,
      watermarkDelay: String): Dataset[LshDecision] = {
    implicit val outEnc = Encoders.product[LshDecision]
    implicit val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.STRING)
    implicit val stateEnc = Encoders.product[EpochState]
    bands.withWatermark("tstamp", watermarkDelay)
      .as[BandHitTs](Encoders.product[BandHitTs])
      .groupByKey(r => (r.band, r.bh))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        lshGroupBounded(horizonMs))
  }

  /** An anchor↔anchor collision: a single document landed in bucket
    * epochs with BOTH anchors, witnessing that the two one-hop
    * clusters are really one. `lo` < `hi` (the witness doc's smallest
    * anchor vs another of its anchors); `tstamp` is the witness doc's
    * event time — it drives the merge state's horizon clock. */
  case class AnchorEdge(lo: Long, hi: Long, tstamp: Timestamp)

  /** Merge state for one anchor: smallest representative witnessed so
    * far + the last-evidence clock for horizon eviction. */
  case class MergeState(rep: Long, last_ms: Long)

  /** `anchor`'s cluster representative improved to `merged_into`. */
  case class MergeUpdate(anchor: Long, merged_into: Long)

  /** Incremental anchor-merge — transitive-closure evidence WITHIN the
    * horizon, the step [[lshScreenBounded]] defers by contract: when a
    * document lands in two bucket epochs with different anchors, those
    * anchors are one cluster, and this operator folds that evidence
    * into a per-anchor representative pointer as it streams in.
    *
    * State is keyed by the LARGER anchor of each collision edge — one
    * fixed-width row per anchor that has appeared on the `hi` side
    * within the horizon, O(active anchors), NOT O(docs) (anchors are
    * one per bucket-epoch, a small fraction of documents). Each batch
    * folds its edges in event-time order; whenever an edge improves
    * the anchor's representative (lo < current rep) it emits a
    * monotone `MergeUpdate` — append-safe, never retracted, so the
    * consumer's roll-up is `min(merged_into) per anchor`. State evicts
    * via `EventTimeTimeout` once the watermark passes the anchor's
    * last evidence + horizon, same session-gap contract as the
    * assignment stage.
    *
    * CONSUMER CONTRACT (closure): the update stream is
    * CONNECTIVITY-COMPLETE — improving edges emit (anchor → newRep),
    * and non-improving edges emit a BACK-LINK (lo → currentRep), so
    * every folded edge (lo, hi) is witnessed by a pair chain through
    * reps. An undirected connected-components pass over the emitted
    * (anchor, merged_into) pairs — a TINY graph, O(active anchors),
    * e.g. [[graft.operators.Dedup.connectedComponents]] — therefore
    * yields the EXACT transitive closure of the witnessed edge set: a
    * chain a₃—a₂—a₁ collapses to a₁ within the SAME batch its last
    * edge arrives in (pinned in StreamingDedupSpec). A consumer that
    * only wants the cheap one-hop answer can still roll up
    * `min(merged_into) per anchor`; updates are append-only and never
    * retracted either way (per-source-group pointers are monotone;
    * back-link targets are whatever the component's best rep was at
    * witness time, so the roll-up is min, not last). Out-of-horizon
    * closure remains the periodic batch CC pass (`q_dup_clusters`) —
    * bounded state now, offline exactness forever. */
  def anchorMerge(
      edges: DataFrame,
      horizonMs: Long,
      watermarkDelay: String): Dataset[MergeUpdate] = {
    implicit val outEnc = Encoders.product[MergeUpdate]
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[MergeState]
    edges.withWatermark("tstamp", watermarkDelay)
      .as[AnchorEdge](Encoders.product[AnchorEdge])
      .groupByKey(_.hi)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        mergeGroup(horizonMs))
  }

  private[streaming] def mergeGroup(horizonMs: Long)(
      anchor: Long,
      rows: Iterator[AnchorEdge],
      state: GroupState[MergeState]): Iterator[MergeUpdate] = {
    if (state.hasTimedOut) {
      // watermark passed last evidence + horizon: merge window closed
      state.remove()
      Iterator.empty
    } else {
      val ordered = rows.toSeq.sortBy(r => (r.tstamp.getTime, r.lo))
      var rep = state.getOption.map(_.rep).getOrElse(anchor)
      var lastMs = state.getOption.map(_.last_ms).getOrElse(Long.MinValue)
      val out = Seq.newBuilder[MergeUpdate]
      ordered.foreach { r =>
        val ms = r.tstamp.getTime
        // gap split enforced in-band too (same as lshGroupBounded): a
        // key that receives data in the very batch its timer would
        // fire never sees hasTimedOut, so the quiet-horizon window
        // close must also be detected from the evidence clock itself
        if (lastMs != Long.MinValue && ms - lastMs > horizonMs) rep = anchor
        lastMs = math.max(lastMs, ms)
        if (r.lo < rep) {
          rep = r.lo
          out += MergeUpdate(anchor, rep)
        } else if (r.lo > rep) {
          // BACK-LINK: the edge proves lo sits in THIS component, whose
          // best-known representative rep is smaller than lo. Emitting
          // (lo → rep) is what makes the update stream
          // connectivity-complete: the pairs {(anchor, each improving
          // lo)} alone lose members that never improved anything (edge
          // (2,3) after (1,3) left 2 stranded), so a consumer could
          // never recover the full component. With back-links, every
          // folded edge (lo, hi) yields a pair chain lo—rep—…—hi, and
          // an undirected closure over ALL updates equals the closure
          // over the witnessed edge set — see the consumer contract in
          // the scaladoc above.
          out += MergeUpdate(r.lo, rep)
        }
      }
      state.update(MergeState(rep, lastMs))
      // admitted rows are ahead of the watermark, so this is too
      state.setTimeoutTimestamp(lastMs + horizonMs)
      out.result().iterator
    }
  }

  private[streaming] def lshGroupBounded(horizonMs: Long)(
      key: (Int, String),
      rows: Iterator[BandHitTs],
      state: GroupState[EpochState]): Iterator[LshDecision] = {
    if (state.hasTimedOut) {
      // watermark passed last-seen + horizon: the epoch is closed
      state.remove()
      Iterator.empty
    } else {
      val ordered = rows.toSeq.sortBy(r => (r.tstamp.getTime, r.doc_id))
      var st = state.getOption
      val out = Seq.newBuilder[LshDecision]
      ordered.foreach { r =>
        val ms = r.tstamp.getTime
        st match {
          case Some(EpochState(c, last)) if ms - last <= horizonMs =>
            out += LshDecision(r.doc_id, c)
            st = Some(EpochState(c, ms))
          case _ => // empty bucket, or in-batch gap beyond the horizon
            out += LshDecision(r.doc_id, r.doc_id)
            st = Some(EpochState(r.doc_id, ms))
        }
      }
      st.foreach { s =>
        state.update(s)
        // admitted rows are ahead of the watermark, so this is too
        state.setTimeoutTimestamp(s.last_ms + horizonMs)
      }
      out.result().iterator
    }
  }
}
