package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.core.Ckpt

/** Pluggable persistence for the incremental engine's cross-batch
  * state tables (entity snapshots, per-edge links/rootmaps, per-tree
  * documents, deferred-priority sets).
  *
  * The reference keeps all engine state in disk-backed RocksDB
  * (reference: state/RocksDBState.java:355-461, README.md:209-221)
  * precisely because state outgrows memory long before the corpus
  * does. The Spark-native split is the same idea at table granularity:
  *
  *  - [[StateBackend.Memory]] — eager MEMORY_ONLY localCheckpoint
  *    (see core/Ckpt.scala for the level rationale). Fastest, but
  *    state dies with block eviction or the session. Right for tests
  *    and short bounded runs that fit the memory envelope.
  *  - [[BucketedParquetBackend]] — every state table lands as a
  *    bucketed parquet table under a state root on any Hadoop
  *    filesystem (file://, hdfs://, s3a://). Durable across eviction
  *    AND session restart, and the bucket layout means the next
  *    batch's keyed joins read pre-partitioned buckets instead of
  *    re-shuffling the (large) state side — the cluster-scale path.
  *
  * Intra-batch temporaries (per-entity deltas, drained dirty sets,
  * changed-doc frames) always stay on the memory path regardless of
  * backend: they are consumed within the batch that created them, so
  * durability would be pure write amplification.
  */
trait StateBackend {

  /** Persisted tables survive block eviction and session loss. */
  def durable: Boolean

  /** Materialize one cross-batch state table under a stable name.
    * The returned frame must be independent of `df`'s lineage (the
    * engine truncates and discards the input plan). */
  def persist(name: String, df: DataFrame): DataFrame

  /** Drop generations superseded by newer [[persist]] calls. The
    * engine calls this only between batches: while a batch's waves
    * run, derived plans still read the PRE-batch generations, so
    * deleting them mid-batch would fail concurrent jobs. */
  def gc(): Unit = ()
}

object StateBackend {
  /** Default in-memory backend — the bench/test envelope. */
  object Memory extends StateBackend {
    val durable = false
    def persist(name: String, df: DataFrame): DataFrame = Ckpt.mem(df)
  }
}

/** Durable state backend: one bucketed parquet table per state-table
  * generation, under `root/<name>/g<n>` (any Hadoop FS scheme).
  *
  * Each persist writes a NEW generation — never in place — because the
  * plan being written typically reads the previous generation of the
  * same table (snapshot update = old snapshot anti-join delta ∪ new
  * rows). The previous generation is queued and dropped on [[gc]],
  * after the batch's last job finishes.
  *
  * The write repartitions by the table's leading column (the state
  * key: `__pk` / `__cpk` / `__jk`) into exactly `buckets` partitions
  * before the bucketed write, so every task holds one bucket and
  * writes one file — a bucketed write without that shuffle emits
  * tasks×buckets small files. Readers go through the session catalog
  * (`spark.table`) so they see the bucket spec: a join or aggregation
  * keyed on the bucket column plans NO Exchange on the state side
  * (asserted in BucketingSpec for the mechanism and in DurableStateSpec
  * on a recovered state table).
  *
  * Restart recovery: [[BucketedParquetBackend.latest]] lists the
  * newest committed (_SUCCESS) generation of every table under a root
  * and returns plain scans — feed them to
  * [[IncrementalDenormalizer.loadStateTables]], which re-persists
  * through the live backend (re-establishing bucket metadata in the
  * new session's catalog).
  */
final class BucketedParquetBackend(
    spark: SparkSession,
    val root: String,
    buckets: Int = 16) extends StateBackend {

  val durable = true

  private val instanceId = BucketedParquetBackend.instances.incrementAndGet()
  private val tableSeq = new AtomicLong(0L)
  /** name → (generation, catalog table, data dir) of the LIVE gen. */
  private val live =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, String, Path)]()
  /** superseded (catalog table if registered, data dir) awaiting [[gc]]. */
  private val retired = new ConcurrentLinkedQueue[(Option[String], Path)]()

  private def fs(p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** Generations already on disk from a PREVIOUS session (restart over
    * an existing root): the first persist of each table must write
    * past them, and they retire once that write commits. */
  private def adoptDiskGens(name: String): Long = {
    val tableDir = new Path(root, name)
    val f = fs(tableDir)
    if (!f.exists(tableDir)) 0L
    else {
      val gens = f.listStatus(tableDir).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("g"))
        .flatMap(s => s.getPath.getName.drop(1).toLongOption.map(_ -> s.getPath))
      gens.foreach { case (_, p) => retired.add((None, p)) }
      gens.map(_._1).maxOption.getOrElse(0L)
    }
  }

  def persist(name: String, df: DataFrame): DataFrame = {
    val prev = live.get(name)
    val gen = if (prev == null) adoptDiskGens(name) + 1L else prev._1 + 1L
    // Catalog identifiers are case-insensitive and charset-limited, so
    // the table name is a mangled-but-unique sequence id; the DATA DIR
    // keeps the exact state-table name (needed for restart recovery).
    val tbl = s"graft_state_${instanceId}_${tableSeq.incrementAndGet()}"
    val dir = new Path(root, s"$name/g$gen")
    val keyCol = df.columns.head
    df.repartition(buckets, col(keyCol))
      .write.format("parquet")
      .bucketBy(buckets, keyCol)
      .option("path", dir.toString)
      .saveAsTable(tbl)
    if (prev != null) retired.add((Some(prev._2), prev._3))
    live.put(name, (gen, tbl, dir))
    spark.table(tbl)
  }

  override def gc(): Unit = {
    var item = retired.poll()
    while (item != null) {
      val (tbl, dir) = item
      // DROP on an external (path-backed) table leaves the files; the
      // directory is deleted explicitly through the Hadoop FS API.
      tbl.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      fs(dir).delete(dir, true)
      item = retired.poll()
    }
  }

  /** Drop every live table + directory (test teardown / --delete-state). */
  def deleteAll(): Unit = {
    gc()
    live.forEach { (_: String, v: (Long, String, Path)) =>
      spark.sql(s"DROP TABLE IF EXISTS ${v._2}")
      fs(v._3).delete(v._3, true)
    }
    live.clear()
    val r = new Path(root)
    val f = fs(r)
    if (f.exists(r)) f.delete(r, true)
  }
}

object BucketedParquetBackend {
  private val instances = new AtomicInteger(0)

  /** Newest committed generation of every state table under `root`,
    * as plain parquet scans keyed by exact state-table name — the
    * restart-recovery input for
    * [[IncrementalDenormalizer.loadStateTables]]. Generations without
    * a _SUCCESS marker (a write that died mid-flight) are skipped, so
    * recovery always lands on the last complete batch. */
  def latest(spark: SparkSession, root: String): Map[String, DataFrame] = {
    val rootPath = new Path(root)
    val f = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!f.exists(rootPath)) return Map.empty
    f.listStatus(rootPath).toSeq.filter(_.isDirectory).flatMap { tableDir =>
      val gens = f.listStatus(tableDir.getPath).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("g"))
        .filter(s => f.exists(new Path(s.getPath, "_SUCCESS")))
        .sortBy(s => s.getPath.getName.drop(1).toLong)
      gens.lastOption.map { g =>
        tableDir.getPath.getName -> spark.read.parquet(g.getPath.toString)
      }
    }.toMap
  }
}
