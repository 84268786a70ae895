package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Relation
import graft.operators.Denormalize
import graft.streaming.IncrementalDenormalizer

/** Giant-document guardrail: `maxChildrenPerEdge` caps each edge's
  * child array at a configurable n, keeping the FIRST n children in
  * canonical child-PK order (the arrays' existing deterministic sort
  * order) and counting what was dropped — `__truncated` on the batch
  * output, the `docs_truncated` counter on the engine. Default off:
  * with no cap the behavior is byte-identical to before.
  *
  * The scale story this pins: a root with 100k+ children is the one
  * shape where the set-at-a-time compiler's per-root `collect_list`
  * grows a single task's memory without bound (IvmSkewStressSpec
  * documents the uncapped risk). With the cap, the pre-aggregation
  * ranking window sorts-and-spills, and no task ever buffers more
  * than n entries per document.
  */
class GiantDocCapSpec extends SparkSpec {

  private val N = 100001L // children on the hot root — over the 100k bar
  private val CAP = 1000

  private val tree = Relation.root("DenormAcct", "acct",
    Relation.child("evt", "acct_id", "id"))
  private val acctSchema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))
  private val evtSchema = StructType(Seq(
    StructField("eid", LongType), StructField("acct_id", LongType),
    StructField("v", LongType)))
  private val pks = Map("acct" -> Seq("id"), "evt" -> Seq("eid"))

  // hot root 1 with N children, cold root 2 with 3 children
  private def acct = spark.createDataFrame(java.util.Arrays.asList(
    org.apache.spark.sql.Row(1L, "hot"),
    org.apache.spark.sql.Row(2L, "cold")), acctSchema)
  private def evt = spark.range(N + 3).select(
    col("id").as("eid"),
    when(col("id") < N, 1L).otherwise(2L).as("acct_id"),
    (col("id") * 2).as("v"))

  test("cap keeps the first n children in canonical-PK order and counts the dropped") {
    def kidEids(df: org.apache.spark.sql.DataFrame, root: Long, limit: Int) =
      df.where(col("id") === root)
        .select(transform(slice(col("doc.Children.evt"), 1, limit),
          x => x("Record")("eid")).as("eids"))
        .collect().head.getSeq[Long](0)
    val capped = Denormalize.documents(tree,
      Map("acct" -> acct, "evt" -> evt), pks, Some(CAP))
    val counts = capped.select(col("id"),
        size(col("doc.Children.evt")).as("n_kids"), col("__truncated"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    // hot root: exactly CAP children, the dropped counted; cold root
    // under the cap: untouched, zero truncation
    assert(counts(1L) == ((CAP, N - CAP)),
      s"hot root truncation wrong: ${counts(1L)}")
    assert(counts(2L) == ((3, 0L)), s"cold root modified: ${counts(2L)}")
    // the kept children are exactly the FIRST CAP entries of the
    // UNCAPPED array — same canonical-PK order (variable-width
    // big-endian bytes, NOT numeric order), truncated, nothing
    // reordered or substituted
    val uncapped = Denormalize.documents(tree,
      Map("acct" -> acct, "evt" -> evt), pks)
    assert(kidEids(capped, 1L, CAP) == kidEids(uncapped, 1L, CAP),
      "capped array is not a prefix of the uncapped order")
  }

  test("default-off path is unchanged and emits no __truncated column") {
    val plain = Denormalize.documents(tree,
      Map("acct" -> acct.where(col("id") === 2L), "evt" -> evt), pks)
    assert(!plain.columns.contains("__truncated"))
    assert(plain.select(size(col("doc.Children.evt"))).collect()
      .head.getInt(0) == 3)
  }

  test("incremental engine under the same cap matches the batch compile and counts truncation") {
    val engine = new IncrementalDenormalizer(spark, Seq(tree),
      pks, Map("acct" -> acctSchema, "evt" -> evtSchema),
      maxChildrenPerEdge = Some(CAP))
    val acctLog = acct.select(
      col("id").as("offset"), struct(col("id")).as("key"),
      struct(col("id"), col("name")).as("value"))
    val evtLog = evt.select(
      col("eid").as("offset"), struct(col("eid")).as("key"),
      struct(col("eid"), col("acct_id"), col("v")).as("value"))
    engine.processBatch(Map("acct" -> acctLog, "evt" -> evtLog))

    val batch = Denormalize.documents(tree,
      Map("acct" -> acct, "evt" -> evt), pks, Some(CAP))
      .select(col("__pk"), col("doc_json")).collect()
      .map(r => BigInt(1, r.getAs[Array[Byte]]("__pk")).toLong ->
        r.getAs[String]("doc_json")).toMap
    val got = engine.docs("DenormAcct").where(!col("__deleted")).collect()
      .map(r => BigInt(1, r.getAs[Array[Byte]]("__pk")).toLong ->
        r.getAs[String]("doc_json")).toMap
    assert(got.keySet == batch.keySet)
    batch.foreach { case (k, doc) =>
      assert(got(k) == doc, s"capped doc $k diverged batch vs incremental")
    }
    assert(engine.counters("docs_truncated") == N - CAP,
      s"truncation counter: ${engine.counters("docs_truncated")}")
  }
}
