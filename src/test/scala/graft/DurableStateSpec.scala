package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Relation
import graft.streaming.{BucketedParquetBackend, IncrementalDenormalizer, QueueingStrategy}
import ReferenceFixtures._

/** Durable-state restart recovery, end to end — the proof that
  * [[graft.streaming.BucketedParquetBackend]] state survives losing the
  * ENTIRE SparkSession, not just block eviction (the reference's
  * restore story: state/RocksDBState.java:639-708 — a new process
  * reopens the state written by the last committed run).
  *
  * Shape: replay all reference topic fixtures EXCEPT the final pass
  * through the durable backend under a temp root, capture every state
  * table, then stop the SparkContext. Open a brand-new session (new
  * context, empty catalog, every in-memory checkpoint block gone),
  * recover purely from disk via [[BucketedParquetBackend.latest]] →
  * `loadStateTables`, and assert all state tables — documents AND the
  * JK link / PaK rootmap indices — byte-equal the pre-restart capture.
  * Then process the final fixture pass on the recovered engine and
  * assert the finished documents equal the reference goldens for all
  * three trees: a replay split across a session restart is
  * indistinguishable from an uninterrupted one.
  */
class DurableStateSpec extends AnyFunSuite with BeforeAndAfterAll {

  /** Same shedding strategy as IncrementalGoldenSpec, so the golden
    * fixtures are the expected output (and the deferred-priority state
    * machinery rides through the restart too). */
  val strategy: QueueingStrategy = (denormName: String, entity: String) =>
    if (denormName == "DenormalizedPlaylist") entity match {
      case "media" => QueueingStrategy.High
      case "user_tag" => QueueingStrategy.None
      case "playlist_custom_params" => QueueingStrategy.Low
      case _ => QueueingStrategy.Medium
    } else QueueingStrategy.Medium

  val trees: Seq[Relation] =
    Seq("relations.sample.json", "relations2.sample.json", "relations3.sample.json")
      .flatMap(f => Relation.parseFile(s"$root/$f"))

  val stateRoot: String =
    "file://" + java.nio.file.Files.createTempDirectory("graft_durable_state")

  private def newEngine(spark: SparkSession): IncrementalDenormalizer =
    new IncrementalDenormalizer(spark, trees, keyFields, valueSchemas,
      testFilter, strategy,
      backend = new BucketedParquetBackend(spark, stateRoot, buckets = 4))

  private def logRows(spark: SparkSession): Map[String, Array[Row]] =
    valueSchemas.keys.map { e =>
      e -> changelog(spark, e).orderBy("offset").collect()
    }.toMap

  private def batchAt(spark: SparkSession, logs: Map[String, Array[Row]],
      pass: Int): Map[String, DataFrame] =
    logs.collect { case (e, rows) if pass < rows.length =>
      e -> spark.createDataFrame(
        java.util.Arrays.asList(rows(pass)), changelog(spark, e).schema)
    }

  /** Structural row comparison (binary keys value-compared). */
  private def comparable(v: Any): Any = v match {
    case b: Array[Byte] => b.toSeq
    case r: Row => r.toSeq.map(comparable)
    case s: Seq[_] => s.map(comparable)
    case m: Map[_, _] => m.map { case (k, x) => comparable(k) -> comparable(x) }
    case x => x
  }
  private def contents(df: DataFrame): Set[Any] =
    df.collect().map(comparable).toSet

  private def docsOf(engine: IncrementalDenormalizer, name: String): Map[Long, Option[String]] =
    engine.docs(name).collect().map { r =>
      BigInt(1, r.getAs[Array[Byte]]("__pk")).toLong ->
        Option(r.getAs[String]("doc_json"))
    }.toMap

  // state captured before the restart, asserted after it
  private var captured: Map[String, Set[Any]] = Map.empty
  private var finalPass: Int = -1
  private var recovered: IncrementalDenormalizer = null

  test("durable state written before a session restart recovers byte-equal in a new session") {
    val sparkA = SparkSpec.session
    val logs = logRows(sparkA)
    val passes = logs.values.map(_.length).max
    finalPass = passes - 1
    val engineA = newEngine(sparkA)
    (0 until finalPass).foreach(p => engineA.processBatch(batchAt(sparkA, logs, p)))
    captured = engineA.stateTables.map { case (n, df) => n -> contents(df) }
    assert(captured.values.exists(_.nonEmpty), "replay produced no state")

    // the restart: the context dies, and with it the catalog and every
    // MEMORY_ONLY checkpoint block — only the parquet generations remain
    sparkA.stop()
    val sparkB = SparkSpec.session
    assert(sparkA.sparkContext.isStopped && (sparkB ne sparkA),
      "expected a genuinely new SparkContext after stop()")

    val gens = BucketedParquetBackend.latest(sparkB, stateRoot)
    // Tables the engine never persisted (pending sets in immediate /
    // every-batch drain mode stay empty) legitimately have no on-disk
    // generation; every table that HELD rows must have one.
    captured.foreach { case (name, rows) =>
      if (!gens.contains(name))
        assert(rows.isEmpty, s"state table $name had rows but no committed generation")
    }
    recovered = newEngine(sparkB)
    recovered.loadStateTables(gens)
    recovered.stateTables.foreach { case (name, df) =>
      assert(contents(df) == captured(name), s"state table $name diverged across restart")
    }
  }

  test("recovered engine finishes the replay to reference-golden parity") {
    val spark = SparkSpec.session
    recovered.processBatch(batchAt(spark, logRows(spark), finalPass))
    trees.flatMap(_.denormalizedName).foreach { name =>
      val got = docsOf(recovered, name)
      val golden = goldenDocs(name)
      assert(got.keySet == golden.keySet,
        s"$name keys differ: extra=${got.keySet.diff(golden.keySet)} missing=${golden.keySet.diff(got.keySet)}")
      golden.foreach { case (k, expected) =>
        (expected, got(k)) match {
          case (None, None) =>
          case (Some(e), Some(g)) =>
            assert(normalizeJson(g) == normalize(e), s"$name/$k:\n got: $g\n exp: $e")
          case other => fail(s"$name/$k tombstone mismatch: $other")
        }
      }
    }
    assert(graft.streaming.StateOps.verifyState(recovered).isEmpty,
      "index invariants violated after recovered replay")
  }

  test("keyed aggregation on a recovered state table plans no Exchange") {
    val docs = recovered.docs(trees.head.denormalizedName.get)
    val plan = docs.groupBy("__pk").count().queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"recovered bucketed state table re-shuffled on its own key:\n$plan")
  }

  test("recovery skips uncommitted generations (_SUCCESS gating)") {
    // a write that died mid-flight leaves data files but no _SUCCESS;
    // recovery must land on the last COMMITTED generation, not the wreck
    val spark = SparkSpec.session
    val before = graft.streaming.BucketedParquetBackend.latest(spark, stateRoot)
    assert(before.nonEmpty)
    val table = before.keys.find(_.startsWith("snapshot__")).getOrElse(before.keys.head)
    val goodRows = contents(before(table))
    val wreck = new org.apache.hadoop.fs.Path(stateRoot, s"$table/g999")
    spark.range(3).toDF("garbage").write.parquet(wreck.toString)
    val fs = wreck.getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.delete(new org.apache.hadoop.fs.Path(wreck, "_SUCCESS"), false),
      "test setup: expected a _SUCCESS marker to remove")
    val after = graft.streaming.BucketedParquetBackend.latest(spark, stateRoot)
    assert(contents(after(table)) == goodRows,
      "recovery read an uncommitted generation")
  }

  override def afterAll(): Unit = {
    val dir = new java.io.File(new java.net.URI(stateRoot))
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(dir)
  }
}
