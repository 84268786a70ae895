package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Operational state management for the incremental engine — the
  * Spark-native analogue of the reference's RocksDB backup/restore/
  * verify CLI (reference: Southpaw.java:525-543,667-670,
  * state/RocksDBState.java:639-708, index/Index.java:366-414).
  *
  * State is persisted as one parquet directory per state table
  * (snapshots, per-edge links/rootmaps, per-tree documents). Backups
  * are timestamped copies of the state root; restore points the engine
  * at a chosen backup. On a cluster the same layout lands on
  * S3/HDFS — parquet + rename is the cloud-native BackupEngine.
  */
object StateOps {

  /** Persist every state table of a live engine under `root`. */
  def backup(engine: IncrementalDenormalizer, root: String): Unit =
    engine.stateTables.foreach { case (name, df) =>
      df.write.mode(SaveMode.Overwrite).parquet(s"$root/$name")
    }

  /** Load persisted state tables back into a new engine. */
  def restore(engine: IncrementalDenormalizer, root: String): Unit = {
    val spark = engine.session
    val dirs = new java.io.File(root).listFiles()
    require(dirs != null && dirs.nonEmpty, s"no state found under $root")
    engine.loadStateTables(
      dirs.filter(_.isDirectory).map { d =>
        d.getName -> spark.read.parquet(d.getAbsolutePath)
      }.toMap)
  }

  /** Delete a persisted state root (the reference's --delete-state /
    * --delete-backup). */
  def deleteState(root: String): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(new java.io.File(root))
  }

  /** Index-invariant check (the reference's --verify-state,
    * index/Indices.java:298-311): every link-table child key must
    * reference a live snapshot row of its entity, and every rootmap
    * root PK must be a live root-entity PK. Cheap set-at-a-time
    * anti-joins instead of full RocksDB scans.
    *
    * @return list of human-readable violations (empty = consistent)
    */
  def verifyState(engine: IncrementalDenormalizer): Seq[String] =
    engine.indexInvariantViolations()
}
