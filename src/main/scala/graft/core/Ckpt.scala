package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Eager lineage-truncating materialization for intra-query reuse.
  *
  * `localCheckpoint(true)` defaults to MEMORY_AND_DISK — every
  * materialized state table or candidate set pays a disk write even
  * when it is consumed seconds later and fits in memory. These
  * checkpoints exist only to truncate lineage and share a computed
  * result within one query/batch (never for fault tolerance — a lost
  * executor fails the query either way in local mode), so MEMORY_ONLY
  * is the right level: blocks evict under pressure and recompute from
  * the (truncated) plan would fail — acceptable for the bench/test
  * envelope, and on a real cluster long-lived state goes to bucketed
  * storage instead (README: scale design).
  */
object Ckpt {
  /** The MEMORY_ONLY envelope is tuned to the 24g/128GiB bench host;
    * smaller hosts can demote eviction-vulnerable blocks to disk with
    * GRAFT_CKPT_LEVEL=MEMORY_AND_DISK instead of editing code. */
  private val level: StorageLevel = sys.env.get("GRAFT_CKPT_LEVEL")
    .map(StorageLevel.fromString).getOrElse(StorageLevel.MEMORY_ONLY)

  def mem(df: DataFrame): DataFrame =
    df.localCheckpoint(eager = true, storageLevel = level)

  /** `df.graftCkptMem()` sugar so call sites read like the built-in. */
  implicit class CkptOps(private val df: DataFrame) extends AnyVal {
    def graftCkptMem(): DataFrame = Ckpt.mem(df)
  }
}
