package graft

import org.apache.spark.sql.functions._

import graft.core.Relation
import graft.operators.{Compaction, Filters}
import graft.streaming.IncrementalDenormalizer

/** Column-fast-path filter semantics through every changelog consumer:
  * a columnMode-only filter (deleteWhere) must actually delete through
  * both [[Compaction.compact]] and the IVM fold — the row path
  * defaulting to Update must never silently no-op it (reference
  * contract: filter/BaseFilter.java:88,106-160).
  */
class FilterSpec extends SparkSpec {
  import spark.implicits._

  private def changelog(rows: Seq[(Long, Long, java.lang.Long)]) =
    rows.toDF("offset", "id", "qty")
      .select(col("offset"), struct(col("id")).as("key"),
        when(col("qty").isNotNull, struct(col("id"), col("qty")))
          .otherwise(lit(null)).as("value"))

  // offsets: id 1 stays at qty=3; id 2's only change is qty=9 (deleted
  // by the filter); id 3 is first qty=4 then qty=10 (latest → deleted).
  private val changes = Seq(
    (1L, 1L, java.lang.Long.valueOf(3L)),
    (2L, 2L, java.lang.Long.valueOf(9L)),
    (3L, 3L, java.lang.Long.valueOf(4L)),
    (4L, 3L, java.lang.Long.valueOf(10L)))

  test("deleteWhere deletes through Compaction.compact") {
    val f = Filters.deleteWhere("item", col("qty") > 5)
    val out = Compaction.compact(changelog(changes), "item", Seq("id"), f)
      .collect()
    val deleted = out.filter(_.getAs[Boolean]("__deleted"))
    val live = out.filter(!_.getAs[Boolean]("__deleted"))
      .map(_.getAs[org.apache.spark.sql.Row]("value"))
      .map(v => v.getAs[Long]("id") -> v.getAs[Long]("qty")).toMap
    assert(live == Map(1L -> 3L))
    assert(deleted.length == 2) // ids 2 and 3 end deleted
  }

  test("deleteWhere deletes through the IVM fold (processBatch)") {
    val schema = changelog(changes).schema("value").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val tree = Relation.root("DenormItem", "item")
    val engine = new IncrementalDenormalizer(spark, Seq(tree),
      Map("item" -> Seq("id")), Map("item" -> schema),
      filter = Filters.deleteWhere("item", col("qty") > 5))
    engine.processBatch(Map("item" -> changelog(changes)))
    val live = engine.snapshot("item").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("qty")).toMap
    assert(live == Map(1L -> 3L))
    // the filtered-out roots surface as doc tombstones, not silence
    assert(engine.docs("DenormItem").where(!col("__deleted")).count() == 1)
    assert(engine.docs("DenormItem").where(col("__deleted")).count() == 2)
  }

  test("columnMode SKIP keeps the prior state (dropped change never applies)") {
    val f = new Filters.RecordFilter {
      override def filter(e: String, r: org.apache.spark.sql.Row,
          old: Option[org.apache.spark.sql.Row]): Filters.FilterMode =
        Filters.FilterMode.Update
      override def columnMode(e: String) =
        Some(when(col("qty") > 5, "SKIP").otherwise("UPDATE"))
    }
    val out = Compaction.compact(changelog(changes), "item", Seq("id"), f)
      .where(!col("__deleted"))
      .select(col("value.id"), col("value.qty"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // id 2's only change skipped → no state at all; id 3 keeps qty=4
    assert(out == Map(1L -> 3L, 3L -> 4L))
  }

  test("tombstones still delete ahead of the column mode") {
    val f = Filters.deleteWhere("item", col("qty") > 5)
    val withTomb = changes :+ ((5L, 1L, null: java.lang.Long))
    val out = Compaction.compact(changelog(withTomb), "item", Seq("id"), f)
      .where(!col("__deleted")).count()
    assert(out == 0) // id 1 tombstoned; 2 and 3 filter-deleted
  }
}
