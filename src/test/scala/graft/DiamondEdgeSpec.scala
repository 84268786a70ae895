package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Relation
import graft.operators.Denormalize
import graft.streaming.IncrementalDenormalizer

/** Diamond fan-out: the SAME child entity under TWO different edges
  * (detail rows attach to a root through a left path and a right
  * path, on different FK fields). A change to a detail record must
  * dirty the roots reachable through EVERY edge it sits on — not just
  * the first edge whose child entity matches. */
class DiamondEdgeSpec extends SparkSpec {

  private val rootSchema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))
  private val midSchema = StructType(Seq(
    StructField("id", LongType), StructField("root_id", LongType)))
  private val detailSchema = StructType(Seq(
    StructField("id", LongType), StructField("left_id", LongType),
    StructField("right_id", LongType), StructField("v", LongType)))

  // root ← left(mid) ← detail(left_id)  AND  root ← detail(right_id):
  // detail appears as the child of TWO edges with different join keys
  private val tree = Relation.root("DenormDiamond", "root",
    Relation.child("mid", "root_id", "id",
      Relation.child("detail", "left_id", "id")),
    Relation.child("detail", "right_id", "id"))
  private val keyFields = Map(
    "root" -> Seq("id"), "mid" -> Seq("id"), "detail" -> Seq("id"))
  private val schemas = Map(
    "root" -> rootSchema, "mid" -> midSchema, "detail" -> detailSchema)

  private def changelog(rows: Seq[Row], schema: StructType): DataFrame =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*),
      StructType(Seq(
        StructField("offset", LongType),
        StructField("key", StructType(Seq(StructField("id", LongType)))),
        StructField("value", schema))))

  private def docsOf(engine: IncrementalDenormalizer): Map[Long, Any] =
    engine.docs("DenormDiamond").where(!col("__deleted"))
      .collect().map(r => BigInt(1, r.getAs[Array[Byte]]("__pk")).toLong ->
        ReferenceFixtures.normalizeJson(r.getAs[String]("doc_json"))).toMap

  private def batchDocs(engine: IncrementalDenormalizer): Map[Long, Any] =
    Denormalize.documents(tree,
      Map("root" -> engine.snapshot("root"), "mid" -> engine.snapshot("mid"),
        "detail" -> engine.snapshot("detail")), keyFields)
      .select(col("__pk"), col("doc_json")).collect()
      .map(r => BigInt(1, r.getAs[Array[Byte]]("__pk")).toLong ->
        ReferenceFixtures.normalizeJson(r.getAs[String]("doc_json"))).toMap

  test("an FK flip on the SECOND edge's join key dirties the roots it moves between") {
    val engine = new IncrementalDenormalizer(spark, Seq(tree), keyFields, schemas)
    engine.processBatch(Map(
      "root" -> changelog(Seq(
        Row(1L, Row(1L), Row(1L, "r1")), Row(2L, Row(2L), Row(2L, "r2"))), rootSchema),
      "mid" -> changelog(Seq(
        Row(1L, Row(10L), Row(10L, 1L))), midSchema),
      "detail" -> changelog(Seq(
        Row(1L, Row(100L), Row(100L, 10L, 1L, 7L))), detailSchema)))
    assert(docsOf(engine) == batchDocs(engine), "initial build diverged")

    // flip the RIGHT-edge FK of the detail: right_id 1 → 2. Root 1
    // loses the right-path child, root 2 gains it; the left path is
    // untouched.
    engine.processBatch(Map(
      "detail" -> changelog(Seq(
        Row(2L, Row(100L), Row(100L, 10L, 2L, 7L))), detailSchema)))
    val incr = docsOf(engine)
    val batch = batchDocs(engine)
    assert(incr == batch,
      s"second-edge FK flip left documents stale:\n incr: $incr\n batch: $batch")
  }
}
