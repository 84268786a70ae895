package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Latest-per-key compaction as a NATIVE Structured Streaming stateful
  * operator — the keyed-state-store alternative to the micro-batch
  * `foreachBatch` engine for pipelines that only need topic-state
  * semantics (reference: topic/KafkaTopic.java:193-205 `-data`
  * keyspace) without document assembly.
  *
  * State per (entity, key) is the latest (offset, value); a null value
  * at the newest offset is a tombstone that REMOVES the state-store
  * entry (reference filter/BaseFilter.java:149-160) and emits one null
  * row so downstream sinks can delete. Out-of-order rows below the
  * current offset are ignored (last-writer-wins by offset — the same
  * convergence contract as the IVM engine's folds). State lives in the
  * Spark state store: checkpointed, partitioned by key hash, scales
  * with key count — no driver-side state at all.
  */
object StatefulCompaction {

  case class ChangeRow(entity: String, offset: Long,
      key_json: String, value_json: String)
  case class KeyState(offset: Long, value: String)

  /** Compact a streaming unified changelog
    * ([[StreamRunner.changelogSchema]]) to one updated row per changed
    * (entity, key) per micro-batch. Run with `OutputMode.Update`. */
  def latestStream(changelog: DataFrame): Dataset[ChangeRow] = {
    implicit val rowEnc = Encoders.product[ChangeRow]
    implicit val keyEnc = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    implicit val stateEnc = Encoders.product[KeyState]
    changelog.as[ChangeRow]
      .groupByKey(r => (r.entity, r.key_json))
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(compactGroup)
  }

  /** One group's batch fold: apply changes in offset order on top of
    * the stored state; emit the post-batch row when anything changed. */
  private[streaming] def compactGroup(
      key: (String, String),
      rows: Iterator[ChangeRow],
      state: GroupState[KeyState]): Iterator[ChangeRow] = {
    val ordered = rows.toSeq.sortBy(_.offset)
    var cur = state.getOption
    var changed = false
    ordered.foreach { r =>
      if (cur.forall(_.offset <= r.offset)) {
        cur = Some(KeyState(r.offset, r.value_json))
        changed = true
      }
    }
    if (!changed) Iterator.empty
    else cur match {
      case Some(KeyState(off, null)) => // tombstone: drop state, emit null
        state.remove()
        Iterator.single(ChangeRow(key._1, off, key._2, null))
      case Some(s) =>
        state.update(s)
        Iterator.single(ChangeRow(key._1, s.offset, key._2, s.value))
      case None => Iterator.empty
    }
  }
}
