package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Relation
import graft.operators.Denormalize
import graft.streaming.IncrementalDenormalizer

/** Self-referential relation tree (an entity that is its own child:
  * manager → direct reports). The same snapshot serves the root AND
  * the child position, so a single record change must fan out BOTH
  * ways: the record's own document rebuilds, and the parents whose
  * child lists it enters/leaves rebuild too — the exact shape an org
  * chart, comment thread, or BOM hierarchy produces. */
class SelfReferenceSpec extends SparkSpec {

  private val empSchema = StructType(Seq(
    StructField("id", LongType), StructField("manager_id", LongType),
    StructField("name", StringType)))
  private val tree = Relation.root("DenormEmp", "emp",
    Relation.child("emp", "manager_id", "id"))
  private val keyFields = Map("emp" -> Seq("id"))

  private def changelog(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*),
      StructType(Seq(
        StructField("offset", LongType),
        StructField("key", StructType(Seq(StructField("id", LongType)))),
        StructField("value", empSchema))))

  private def reports(engine: IncrementalDenormalizer): Map[Long, Set[Long]] =
    engine.docs("DenormEmp").where(!col("__deleted"))
      .select(
        get_json_object(col("doc_json"), "$.Record.id").cast(LongType).as("id"),
        col("doc_json"))
      .collect().map { r =>
        val doc = r.getAs[String]("doc_json")
        val kids = """"Children"""".r // keep scalac quiet about escapes
        val ids = """\{"Record":\{"id":(\d+),"manager_id":""".r
          .findAllMatchIn(doc).map(_.group(1).toLong).toSet - r.getAs[Long]("id")
        r.getAs[Long]("id") -> ids
      }.toMap

  test("a manager flip rebuilds the record, the OLD manager, and the NEW manager") {
    val engine = new IncrementalDenormalizer(spark, Seq(tree),
      keyFields, Map("emp" -> empSchema))
    // ceo(1) ← a(2), b(3); a(2) ← c(4)
    engine.processBatch(Map("emp" -> changelog(Seq(
      Row(1L, Row(1L), Row(1L, 0L, "ceo")),
      Row(2L, Row(2L), Row(2L, 1L, "a")),
      Row(3L, Row(3L), Row(3L, 1L, "b")),
      Row(4L, Row(4L), Row(4L, 2L, "c"))))))
    assert(reports(engine) == Map(
      1L -> Set(2L, 3L), 2L -> Set(4L), 3L -> Set.empty, 4L -> Set.empty))

    // flip c's manager a(2) → b(3): docs 2 (loses c), 3 (gains c), and
    // 4 (its own record changed) must all rebuild
    engine.processBatch(Map("emp" -> changelog(Seq(
      Row(5L, Row(4L), Row(4L, 3L, "c"))))))
    val got = reports(engine)
    // batch-compiled oracle over the final snapshot
    val expected = Denormalize.documents(
      tree, Map("emp" -> engine.snapshot("emp")), keyFields)
      .select(col("__pk"), col("doc_json")).collect().map { r =>
        val doc = r.getAs[String]("doc_json")
        val id = BigInt(1, r.getAs[Array[Byte]]("__pk")).toLong
        id -> ("""\{"Record":\{"id":(\d+),"manager_id":""".r
          .findAllMatchIn(doc).map(_.group(1).toLong).toSet - id)
      }.toMap
    assert(got == expected,
      s"incremental diverged from batch on self-referential FK flip:\n got $got\n exp $expected")
    assert(got(2L) == Set.empty && got(3L) == Set(4L),
      s"old/new manager docs stale: $got")
    assert(graft.streaming.StateOps.verifyState(engine).isEmpty)
  }
}
