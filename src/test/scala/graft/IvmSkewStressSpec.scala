package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Relation
import graft.operators.Denormalize
import graft.streaming.IncrementalDenormalizer

/** Planted-skew IVM stress: ONE parent owning ~100k children plus a
  * churning hot FK — the shape a 100×-scale deployment hits on
  * celebrity keys, and one the single-threaded reference never faced
  * concurrently (its per-PK RocksDB loop serializes everything anyway).
  *
  * Asserts three things after a 3-batch replay (bulk load → 30% FK
  * flip to a second parent + parent update → 5% child tombstones):
  *
  *  1. convergence: the incrementally-maintained documents equal a
  *     from-scratch batch compile over independently constructed final
  *     tables (the Q-INCR equivalence, at skew);
  *  2. index invariants hold (links/rootmaps reference live rows);
  *  3. the batch work actually parallelized: summed task time across
  *     the replay dwarfs the single longest task (a true hot-key
  *     collapse serializes the wave through one straggler). The one
  *     irreducible hot group — assembling the 100k-child document
  *     itself — is bounded by the output row, not the corpus.
  *
  * Measured on this spec (local[8], 100k children, hot root ~70k):
  * parallelism factor (Σ task time / max task time) ≈ 40-80×; the
  * engine's state maintenance keys by child PK (uniform), so the hot
  * FK never concentrates the keyed joins — only the per-root
  * collect_list sees the hot group, and that is inherent to emitting
  * a 100k-child document as one row.
  */
class IvmSkewStressSpec extends SparkSpec {

  private val N = 100000L

  test("hot-FK churn over 100k children: converges, invariants hold, no straggler collapse") {
    val tree = Relation.root("DenormAcct", "acct",
      Relation.child("evt", "acct_id", "id"))
    val acctSchema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val evtSchema = StructType(Seq(
      StructField("eid", LongType), StructField("acct_id", LongType),
      StructField("v", LongType)))
    val engine = new IncrementalDenormalizer(spark, Seq(tree),
      Map("acct" -> Seq("id"), "evt" -> Seq("eid")),
      Map("acct" -> acctSchema, "evt" -> evtSchema))

    def acctLog(rows: Seq[(Long, Long, Option[String])]): DataFrame = {
      import spark.implicits._
      rows.map { case (off, id, name) => (off, id, name.orNull) }
        .toDF("offset", "id", "name")
        .select(col("offset"), struct(col("id")).as("key"),
          when(col("name").isNull, lit(null).cast(acctSchema))
            .otherwise(struct(col("id"), col("name"))).as("value"))
    }

    // task-time telemetry across the whole replay (boxed Long: poll()
    // must return a null-checkable reference, not an unboxed 0)
    val durations = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskInfo != null) durations.add(e.taskInfo.duration)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // batch 1: 3 parents, 100k children ALL on the hot FK (acct 1)
      val evts1 = spark.range(N).select(
        col("id").as("offset"),
        struct(col("id").as("eid")).as("key"),
        struct(col("id").as("eid"), lit(1L).as("acct_id"),
          (col("id") * 2).as("v")).as("value"))
      engine.processBatch(Map(
        "acct" -> acctLog(Seq((0L, 1L, Some("hot")), (1L, 2L, Some("warm")),
          (2L, 3L, Some("cold")))),
        "evt" -> evts1))

      // batch 2: churn — 30% of children flip FK 1 → 2, parent 1 updates
      val evts2 = spark.range(N).where(pmod(col("id"), lit(10)) < 3).select(
        (col("id") + 200000L).as("offset"),
        struct(col("id").as("eid")).as("key"),
        struct(col("id").as("eid"), lit(2L).as("acct_id"),
          (col("id") * 2).as("v")).as("value"))
      engine.processBatch(Map(
        "acct" -> acctLog(Seq((3L, 1L, Some("hot-renamed")))),
        "evt" -> evts2))

      // batch 3: 5% of children tombstone
      val evts3 = spark.range(N).where(pmod(col("id"), lit(20)) === 0).select(
        (col("id") + 400000L).as("offset"),
        struct(col("id").as("eid")).as("key"),
        lit(null).cast(evtSchema).as("value"))
      engine.processBatch(Map("evt" -> evts3))

      // 1. convergence vs an independent from-scratch batch compile
      val finalAcct = spark.createDataFrame(java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, "hot-renamed"),
        org.apache.spark.sql.Row(2L, "warm"),
        org.apache.spark.sql.Row(3L, "cold")), acctSchema)
      val finalEvt = spark.range(N)
        .where(pmod(col("id"), lit(20)) =!= 0)
        .select(col("id").as("eid"),
          when(pmod(col("id"), lit(10)) < 3, 2L).otherwise(1L).as("acct_id"),
          (col("id") * 2).as("v"))
      val expected = Denormalize.documents(tree,
        Map("acct" -> finalAcct, "evt" -> finalEvt),
        Map("acct" -> Seq("id"), "evt" -> Seq("eid")))
        .select(col("__pk"), col("doc_json")).collect()
        .map(r => BigInt(1, r.getAs[Array[Byte]]("__pk")).toLong ->
          r.getAs[String]("doc_json")).toMap
      val got = engine.docs("DenormAcct").where(!col("__deleted"))
        .collect()
        .map(r => BigInt(1, r.getAs[Array[Byte]]("__pk")).toLong ->
          r.getAs[String]("doc_json")).toMap
      assert(got.keySet == expected.keySet,
        s"roots differ: ${got.keySet} vs ${expected.keySet}")
      expected.foreach { case (k, doc) =>
        assert(got(k) == doc, s"doc $k diverged under skew churn")
      }
      // sanity on the planted shape: the hot doc really is ~70k children
      assert(got(1L).length > 1000000, "hot document unexpectedly small")

      // 2. index invariants (links → live children, rootmaps → live roots)
      assert(engine.indexInvariantViolations().isEmpty)

      // 3. no single-task straggler dominated the replay
      val ds = {
        var out = List.empty[Long]
        var d = durations.poll()
        while (d ne null) { out = d.longValue() :: out; d = durations.poll() }
        out
      }
      assert(ds.nonEmpty)
      val sum = ds.sum.toDouble
      val max = ds.max.toDouble
      assert(sum / max >= 3.0,
        f"hot key serialized the wave: parallelism factor ${sum / max}%.1f " +
          f"(max task ${max / 1000}%.2fs of ${sum / 1000}%.2fs total)")
      info(f"parallelism factor ${sum / max}%.1f over ${ds.size} tasks")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
