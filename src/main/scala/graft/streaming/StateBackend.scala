package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}
import org.apache.spark.sql.types.StructType

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

  /** [[persist]] with the batch's change set attached: `delta` is
    * `(rows, keys)` where `keys` lists every key whose row was added,
    * replaced, or removed since the LAST persist of `name`, and `rows`
    * holds the full new rows for those keys (a key in `keys` with no
    * row in `rows` is a deletion). The caller guarantees
    * `df ≡ previous.join(keys, keys.columns, "left_anti") ∪ rows` —
    * which lets a durable backend write O(delta) instead of O(state)
    * per batch (the reference's RocksDB WriteBatch semantics,
    * state/RocksDBState.java:611-636, where only touched keys hit the
    * WAL). Backends free to ignore the hint fall back to a full
    * persist of `df`. */
  def persist(name: String, df: DataFrame,
      delta: Option[(DataFrame, DataFrame)]): DataFrame =
    persist(name, df)

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

/** Durable state backend: generation-chained parquet per state table,
  * under `root/<name>/g<n>` (any Hadoop FS scheme).
  *
  * Two generation kinds, distinguished by a `_MANIFEST` commit marker
  * (written last, via atomic rename — a generation without one is an
  * uncommitted wreck and is never read):
  *
  *  - FULL — the whole table as a bucketed parquet catalog table.
  *    The write repartitions by the table's leading column (the state
  *    key: `__pk` / `__cpk` / `__jk`) into exactly `buckets`
  *    partitions before the bucketed write, so every task holds one
  *    bucket and writes one file. Readers go through the session
  *    catalog (`spark.table`) so they see the bucket spec: a join or
  *    aggregation keyed on the bucket column plans NO Exchange on the
  *    state side (BucketingSpec; DurableStateSpec on a recovered
  *    table).
  *  - DELTA — only the batch's change set: `rows/` (full new rows for
  *    changed keys) + `keys/` (every changed key; a key with no row is
  *    a deletion). This is the reference's RocksDB WriteBatch write
  *    profile (state/RocksDBState.java:611-636: only touched keys hit
  *    the store) — write cost scales with the DELTA, not the state.
  *    The composed view is `prev.join(keys, keys.columns, "left_anti")
  *    .unionByName(rows)` folded over the chain; the changed-key side
  *    is batch-sized, so Catalyst plans it as a broadcast anti-join —
  *    the full-state side never re-shuffles for composition.
  *
  * Every `compactEvery`-th persist of a table writes FULL, bounding
  * the compose chain (and restoring bucket metadata); a persist
  * without delta information (first persist, restart recovery) is
  * always FULL. Each persist writes a NEW generation — never in
  * place — because the plan being written typically reads the previous
  * generation of the same table. Superseded generations are queued and
  * dropped on [[gc]], after the batch's last job finishes; delta
  * chains retire only when a FULL persist supersedes the whole chain.
  *
  * Restart recovery: [[recover]] composes the newest committed full
  * generation + its committed delta suffix for every table under the
  * root THROUGH THE CATALOG — each bucketed base/delta `rows/`
  * directory is registered as a bucketed table (bucket metadata lives
  * only in the catalog; a raw `spark.read.parquet` forgets the
  * layout) and the chain zips with [[graft.plans.BucketUnion]],
  * exactly like the live [[persistDelta]] compose — so keyed reads
  * against recovered state plan no state-side Exchange even before
  * the first post-restart compaction, mirroring the reference, whose
  * RocksDB state is key-indexed the moment it reopens (reference
  * state/RocksDBState.java:474-491). Feed the result to
  * [[IncrementalDenormalizer.loadStateTables]], which re-persists
  * through the live backend (a FULL write: recovery doubles as
  * compaction — and because the recovered plan is already
  * bucket-aligned, [[persistFull]]'s aligned fast path writes it
  * WITHOUT the full-state re-shuffle). The static
  * [[BucketedParquetBackend.latest]] remains as the layout-agnostic
  * read-only path (no catalog registration, plain compose).
  */
final class BucketedParquetBackend(
    spark: SparkSession,
    val root: String,
    buckets: Int = 16,
    compactEvery: Int = 4) extends StateBackend {

  import BucketedParquetBackend.writeMarker

  // Register the BucketUnion planner strategy + pushdown rule NOW, at
  // backend construction — not lazily at the first compose. A
  // Structured Streaming query clones the session (and with it the
  // experimental strategy list) when it STARTS; if the first delta
  // compose happens inside a later micro-batch, the registration lands
  // on the outer session only, and the clone's planner fails with
  // "No plan for BucketUnionPlan" on the first keyed read of composed
  // state. Construction always precedes StreamRunner.start, so the
  // clone inherits the strategy. (Caught by MainSpec's restart test
  // run in a fresh session: a delta-free recovery registers nothing,
  // and the restarted run's first delta compose was mid-stream.)
  graft.plans.BucketUnion.register(spark)

  val durable = true

  private case class Chain(
      maxGen: Long,
      table: String,          // catalog table of the base FULL gen
      baseDir: Path,
      deltas: Vector[(Path, String)], // (gen dir, rows catalog table)
      frame: DataFrame)

  private val instanceId = BucketedParquetBackend.instances.incrementAndGet()
  private val tableSeq = new AtomicLong(0L)
  private val live =
    new java.util.concurrent.ConcurrentHashMap[String, Chain]()
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

  def persist(name: String, df: DataFrame): DataFrame =
    persistFull(name, df)

  override def persist(name: String, df: DataFrame,
      delta: Option[(DataFrame, DataFrame)]): DataFrame = {
    val prev = live.get(name)
    delta match {
      case Some((rows, keys))
          if prev != null && prev.deltas.size < compactEvery - 1 =>
        persistDelta(name, prev, rows, keys)
      case _ => persistFull(name, df)
    }
  }

  private def persistFull(name: String, df: DataFrame): DataFrame = {
    val prev = live.get(name)
    val gen = if (prev == null) adoptDiskGens(name) + 1L else prev.maxGen + 1L
    // Catalog identifiers are case-insensitive and charset-limited, so
    // the table name is a mangled-but-unique sequence id; the DATA DIR
    // keeps the exact state-table name (needed for restart recovery).
    val tbl = s"graft_state_${instanceId}_${tableSeq.incrementAndGet()}"
    val dir = new Path(root, s"$name/g$gen")
    val keyCol = df.columns.head
    // Aligned fast path: a frame whose plan is already a BucketUnion
    // compose on (keyCol, buckets) — a recovered chain, or any
    // delta-composed view being compacted — arrives with partition i
    // holding exactly bucket i's keys (the zip preserves
    // HashPartitioning, and the bucketed write derives bucket ids from
    // the same Murmur3 pmod), so the pre-write repartition would be a
    // full-state shuffle for nothing. Skipping it, each task writes
    // exactly its one bucket file.
    val src =
      if (graft.plans.BucketUnion.isAligned(df, keyCol, buckets)) df
      else df.repartition(buckets, col(keyCol))
    src.write.format("parquet")
      .bucketBy(buckets, keyCol)
      .option("path", dir.toString)
      .saveAsTable(tbl)
    // schema sidecar BEFORE the commit marker: a bucketed write of an
    // EMPTY frame emits no data files at all, so a later recover/asOf
    // could not infer the table schema from parquet footers — an empty
    // state table (a scrubbed rootmap, a link table before its first
    // edge) must survive restart as EMPTY, not as unreadable
    BucketedParquetBackend.writeSchema(fs(dir), dir, df.schema)
    writeMarker(fs(dir), dir, "full", buckets)
    if (prev != null) {
      retired.add((Some(prev.table), prev.baseDir))
      prev.deltas.foreach { case (d, t) => retired.add((Some(t), d)) }
    }
    val frame = spark.table(tbl)
    live.put(name, Chain(gen, tbl, dir, Vector.empty, frame))
    frame
  }

  /** Write only the batch's change set as a new delta generation and
    * return the chain-composed view. Neither `rows` nor `keys` reads
    * more than the batch's change neighborhood, and the full-table
    * plan is never evaluated — durable write cost ∝ delta.
    *
    * The `rows` write is BUCKETED by the same key column as the full
    * generation, and the composed view zips base and delta bucket to
    * bucket ([[graft.plans.BucketUnion]]) instead of `union`-ing them:
    * a plain union has unknown output partitioning, so every keyed
    * join/aggregation against a delta-composed state table would
    * re-shuffle the full state side for up to `compactEvery − 1`
    * batches after each compaction — paying on read exactly what the
    * delta write saved. With the aligned compose the chain keeps the
    * full generation's no-Exchange property end to end
    * (BucketingSpec). */
  private def persistDelta(name: String, prev: Chain,
      rows: DataFrame, keys: DataFrame): DataFrame = {
    val gen = prev.maxGen + 1L
    val dir = new Path(root, s"$name/g$gen")
    val keyCol = prev.frame.columns.head
    val tbl = s"graft_state_${instanceId}_${tableSeq.incrementAndGet()}"
    // Change sets are batch-sized: the pre-write repartition is a
    // delta-sized shuffle that lands exactly one file per bucket.
    rows.select(prev.frame.columns.map(col).toSeq: _*)
      .repartition(buckets, col(keyCol))
      .write.format("parquet")
      .bucketBy(buckets, keyCol)
      .option("path", new Path(dir, "rows").toString)
      .saveAsTable(tbl)
    keys.coalesce(buckets).write.parquet(new Path(dir, "keys").toString)
    writeMarker(fs(dir), dir, "delta", buckets)
    // read both sides back from disk so the composed frame is
    // independent of the input plans' lineage
    val keysDf = spark.read.parquet(new Path(dir, "keys").toString)
    val kept = prev.frame.join(
      org.apache.spark.sql.functions.broadcast(keysDf),
      keysDf.columns.toSeq, "left_anti")
    val frame = graft.plans.BucketUnion(kept, spark.table(tbl), keyCol, buckets)
    live.put(name, prev.copy(maxGen = gen,
      deltas = prev.deltas :+ ((dir, tbl)), frame = frame))
    frame
  }

  /** Register a bucketed parquet directory (a full generation, or a
    * delta's `rows/`) as an external catalog table so readers see the
    * bucket spec. DDL because the DataFrame API can only CTAS. */
  private def registerBucketed(dir: Path, schema: StructType,
      keyCol: String, bucketCount: Int): String = {
    val tbl = s"graft_state_${instanceId}_${tableSeq.incrementAndGet()}"
    spark.sql(s"CREATE TABLE $tbl (${schema.toDDL}) USING PARQUET " +
      s"CLUSTERED BY (`$keyCol`) INTO $bucketCount BUCKETS " +
      s"LOCATION '${dir.toString}'")
    tbl
  }

  /** Restart recovery through the live backend (see class doc): the
    * newest committed chain of every table under [[root]], composed
    * bucket-aligned. Chains are adopted into [[live]], so each table's
    * first post-restore persist supersedes the adopted generations and
    * [[gc]] retires their files and catalog entries together; disk
    * generations OUTSIDE the adopted chain (uncommitted wrecks,
    * superseded older generations) queue for retirement immediately.
    * Tables whose markers predate the bucket-count format (or whose
    * chain mixes bucket counts) compose unbucketed — one full-state
    * shuffle on the recovery persist, never a wrong layout guess. */
  def recover(): Map[String, DataFrame] = {
    val rootPath = new Path(root)
    val f = fs(rootPath)
    if (!f.exists(rootPath)) return Map.empty
    f.listStatus(rootPath).toSeq.filter(_.isDirectory).flatMap { tableDir =>
      val name = tableDir.getPath.getName
      val info = BucketedParquetBackend.committedGens(f, tableDir.getPath)
      val base = info.filter(_._3.exists(_._1 == "full")).lastOption
      if (base.isEmpty && info.exists(_._3.exists(_._1 == "delta")))
        throw new IllegalStateException(
          s"state table ${tableDir.getPath} has committed delta " +
            "generations but no committed full generation; refusing to " +
            "recover an empty state over existing data")
      base.map { case (baseId, baseDir, baseInfo) =>
        val suffix = info.filter(_._1 > baseId)
          .takeWhile(_._3.exists(_._1 == "delta"))
        val chainDirs = (baseDir +: suffix.map(_._2)).toSet
        info.filterNot(g => chainDirs(g._2))
          .foreach(g => retired.add((None, g._2)))
        val counts = (baseInfo +: suffix.map(_._3)).map(_.flatMap(_._2))
        val bucketCount = counts.head
        val frame =
          if (bucketCount.isDefined && counts.forall(_ == bucketCount)) {
            val schema =
              BucketedParquetBackend.readBase(spark, f, baseDir).schema
            val keyCol = schema.fields.head.name
            val baseTbl =
              registerBucketed(baseDir, schema, keyCol, bucketCount.get)
            var cur = spark.table(baseTbl)
            val deltas = suffix.map { case (_, dir, _) =>
              val rowsTbl = registerBucketed(
                new Path(dir, "rows"), schema, keyCol, bucketCount.get)
              val keysDf =
                spark.read.parquet(new Path(dir, "keys").toString)
              val kept = cur.join(broadcast(keysDf),
                keysDf.columns.toSeq, "left_anti")
              cur = graft.plans.BucketUnion(
                kept, spark.table(rowsTbl), keyCol, bucketCount.get)
              (dir, rowsTbl)
            }
            // maxGen spans ALL disk generations, not just the chain: an
            // uncommitted wreck beyond the chain still occupies its gen
            // directory, and the next persist must write past it
            live.put(name, Chain(
              maxGen = info.lastOption.map(_._1).getOrElse(baseId),
              table = baseTbl, baseDir = baseDir,
              deltas = deltas.toVector, frame = cur))
            cur
          } else
            // legacy chain: plain compose; the table stays out of
            // `live`, so its first persist takes the adoptDiskGens path
            suffix.foldLeft(BucketedParquetBackend.readBase(spark, f, baseDir)) {
              (cur, g) => BucketedParquetBackend.applyDelta(spark, cur, g._2)
            }
        name -> frame
      }
    }.toMap
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
    live.forEach { (_: String, v: Chain) =>
      spark.sql(s"DROP TABLE IF EXISTS ${v.table}")
      fs(v.baseDir).delete(v.baseDir, true)
      v.deltas.foreach { case (d, t) =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        fs(d).delete(d, true)
      }
    }
    live.clear()
    val r = new Path(root)
    val f = fs(r)
    if (f.exists(r)) f.delete(r, true)
  }
}

object BucketedParquetBackend {
  private val instances = new AtomicInteger(0)

  /** Schema sidecar for full generations (`_SCHEMA`, StructType json):
    * the authoritative table schema when the generation holds no
    * parquet files (empty state table). Written before the commit
    * marker, so a committed generation always carries it. */
  private[streaming] def writeSchema(f: org.apache.hadoop.fs.FileSystem,
      dir: Path, schema: StructType): Unit = {
    val out = f.create(new Path(dir, "_SCHEMA"), true)
    out.write(schema.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
  }

  private def readSchemaSidecar(f: org.apache.hadoop.fs.FileSystem,
      dir: Path): Option[StructType] = {
    val p = new Path(dir, "_SCHEMA")
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n > 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        Some(org.apache.spark.sql.types.DataType.fromJson(
          bytes.toString("UTF-8")).asInstanceOf[StructType])
      } finally in.close()
    }
  }

  /** Read a full-generation directory, surviving the zero-file case
    * via the `_SCHEMA` sidecar; pre-sidecar generations (which always
    * had data files) fall back to footer inference. */
  private[streaming] def readBase(spark: SparkSession,
      f: org.apache.hadoop.fs.FileSystem, dir: Path): DataFrame =
    readSchemaSidecar(f, dir) match {
      case Some(s) => spark.read.schema(s).parquet(dir.toString)
      case None => spark.read.parquet(dir.toString)
    }

  /** Commit marker: `_MANIFEST` holds `kind:buckets` (the bucket
    * count lets [[BucketedParquetBackend.recover]] re-register the
    * directory with its true layout) and is written LAST via
    * create-then-rename, so its presence implies the generation's
    * data is complete (the `_SUCCESS`-equivalent gate — a write that
    * died mid-flight leaves data files but no marker). */
  private def writeMarker(f: org.apache.hadoop.fs.FileSystem,
      dir: Path, kind: String, bucketCount: Int): Unit = {
    val tmp = new Path(dir, "_MANIFEST.tmp")
    val out = f.create(tmp, true)
    out.write(s"$kind:$bucketCount"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    // fail LOUD on a false rename (dest exists, FS quirk): a generation
    // whose marker never landed would be live in this session's chain
    // but invisible to recovery — the checkpoint would advance past a
    // batch that a restart silently replays from an older generation
    if (!f.rename(tmp, new Path(dir, "_MANIFEST")))
      throw new java.io.IOException(
        s"could not commit generation marker ${new Path(dir, "_MANIFEST")}")
  }

  /** Committed generation `(kind, bucket count)`. Markers since the
    * bucket-count format hold `kind:buckets`; earlier ones hold just
    * `kind` (count unknown → None). Pre-delta versions of this backend
    * wrote no `_MANIFEST` at all — their full generations carry only
    * parquet's `_SUCCESS` at the generation root (delta generations
    * nest it under `rows/`/`keys/`), so a `_SUCCESS`-only directory is
    * a committed FULL generation from the OLD format, not a wreck:
    * without this a restart over a pre-delta state root would silently
    * recover an EMPTY state map and rebuild from offset zero. The
    * fallback is scoped by `allowSuccessFallback` to tables where NO
    * generation has a `_MANIFEST`: on a manifest-format table, a full
    * generation whose parquet job committed (`_SUCCESS` present) but
    * whose marker write crashed must stay invisible — the engine
    * checkpoint never advanced past that batch, and recovering it
    * would make the restart replay the batch on top of state that
    * already includes it. */
  private def markerInfo(f: org.apache.hadoop.fs.FileSystem,
      dir: Path, allowSuccessFallback: Boolean): Option[(String, Option[Int])] =
    readMarker(f, dir).map { s =>
      s.split(':') match {
        case Array(kind, b) => (kind, b.toIntOption)
        case _ => (s, None)
      }
    }.orElse {
      if (allowSuccessFallback && f.exists(new Path(dir, "_SUCCESS")))
        Some(("full", None))
      else None
    }

  /** All `g<n>` generation directories of one state table in id order,
    * each with its committed-marker info (None = uncommitted wreck).
    * The `_SUCCESS` fallback is enabled only when the whole table
    * predates the manifest format (see [[markerInfo]]). */
  private def committedGens(f: org.apache.hadoop.fs.FileSystem,
      tableDir: Path): Seq[(Long, Path, Option[(String, Option[Int])])] = {
    val gens = f.listStatus(tableDir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("g"))
      .flatMap(s => s.getPath.getName.drop(1).toLongOption.map(_ -> s.getPath))
      .sortBy(_._1)
    val preManifest =
      !gens.exists { case (_, p) => f.exists(new Path(p, "_MANIFEST")) }
    gens.map { case (id, p) => (id, p, markerInfo(f, p, preManifest)) }
  }

  private def readMarker(f: org.apache.hadoop.fs.FileSystem,
      dir: Path): Option[String] = {
    val m = new Path(dir, "_MANIFEST")
    if (!f.exists(m)) None
    else {
      val in = f.open(m)
      try {
        val bytes = new Array[Byte](32)
        val n = in.read(bytes)
        Some(new String(bytes, 0, math.max(n, 0),
          java.nio.charset.StandardCharsets.UTF_8).trim)
      } finally in.close()
    }
  }

  /** One delta-generation layer: drop the changed keys from the view
    * so far, add the generation's new rows (a changed key without a
    * row stays dropped = deletion). The keys side is batch-sized, so
    * Catalyst's size estimate plans a broadcast anti-join — the state
    * side is never shuffled for composition. */
  private def applyDelta(spark: SparkSession, cur: DataFrame,
      deltaDir: Path): DataFrame = {
    val keys = spark.read.parquet(new Path(deltaDir, "keys").toString)
    // rows/ is a BUCKETED write, which emits no data file at all for an
    // empty change set (a plain write leaves a schema-bearing empty
    // file) — read with the base generation's schema, which is the
    // chain's schema by construction, so empty deltas stay composable
    val rows = spark.read.schema(cur.schema)
      .parquet(new Path(deltaDir, "rows").toString)
    cur.join(keys, keys.columns.toSeq, "left_anti").unionByName(rows)
  }

  /** The newest committed state of every table under `root`: the last
    * full generation with a commit marker, composed with its committed
    * delta suffix in generation order. Generations without a marker
    * (a write that died mid-flight) are skipped, and the walk up the
    * delta suffix stops at the first uncommitted generation, so
    * recovery always lands on the last complete batch.
    *
    * This is the read-only, layout-agnostic path (plain parquet reads,
    * broadcast-anti compose — no catalog registration): right for
    * inspection and cross-backend reads. ENGINE restarts should go
    * through the live backend's [[BucketedParquetBackend.recover]],
    * which composes the same chain bucket-aligned. */
  def latest(spark: SparkSession, root: String): Map[String, DataFrame] =
    asOf(spark, root, Long.MaxValue)

  /** Time travel over the generational layout: every table's committed
    * state as of generation `gen` — the last committed full generation
    * with id ≤ `gen`, composed with its committed delta suffix up to
    * `gen`. Because every engine batch commits one generation per
    * touched table, this answers "what did the engine believe after
    * batch N" for any batch still on disk — the per-batch refinement of
    * the reference's whole-store backup restore (RocksDBState.java:
    * 355-461 can only rewind to a rotated backup; the delta chain
    * rewinds to any batch for free).
    *
    * Retention bound: [[gc]] retires a superseded chain when
    * compaction rewrites full, so the travel window is what gc hasn't
    * deleted yet — a retired chain's base and deltas go together, so a
    * too-old `gen` yields the table ABSENT from the map, never a
    * half-composed state. */
  def asOf(spark: SparkSession, root: String, gen: Long): Map[String, DataFrame] = {
    val rootPath = new Path(root)
    val f = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!f.exists(rootPath)) return Map.empty
    f.listStatus(rootPath).toSeq.filter(_.isDirectory).flatMap { tableDir =>
      val gens = committedGens(f, tableDir.getPath).filter(_._1 <= gen)
      val base = gens.filter(_._3.exists(_._1 == "full")).lastOption
      // A COMMITTED delta can only exist after its base committed, so
      // finding one with no committed full generation is corruption —
      // fail loud rather than silently recover an empty state and
      // rebuild from offset zero. (Uncommitted-only wrecks are NOT an
      // error: a table whose very first persist died mid-flight never
      // committed a batch, so the empty fresh start is the truth.)
      if (base.isEmpty && gens.exists(_._3.exists(_._1 == "delta")))
        throw new IllegalStateException(
          s"state table ${tableDir.getPath} has committed delta " +
            "generations but no committed full generation; refusing to " +
            "recover an empty state over existing data")
      base.map { case (baseId, baseDir, _) =>
        val suffix = gens.filter(_._1 > baseId)
          .takeWhile(_._3.exists(_._1 == "delta"))
        val frame = suffix.foldLeft(readBase(spark, f, baseDir)) {
          (cur, g) => applyDelta(spark, cur, g._2)
        }
        tableDir.getPath.getName -> frame
      }
    }.toMap
  }
}
