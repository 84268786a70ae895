package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.FixtureReader

/** The DataSource V2 changelog connector (`graft-changelog`) must
  * produce exactly [[FixtureReader.readTopic]]'s rows, prune columns
  * down to the scan (including nested fields), honor tombstones, and
  * split records across input partitions with stable offsets. */
class ChangelogSourceSpec extends AnyFunSuite with SparkSpec {

  private val entity = "playlist"
  private def path = s"${ReferenceFixtures.root}/topic/$entity.json"

  private def readV2(splits: Int = 4) =
    spark.read.format("graft-changelog")
      .option("keySchema", ReferenceFixtures.keySchema(entity).toDDL)
      .option("valueSchema", ReferenceFixtures.valueSchemas(entity).toDDL)
      .option("splits", splits.toString)
      .load(path)

  test("rows match FixtureReader exactly") {
    val expected = FixtureReader.readTopic(spark, path,
      ReferenceFixtures.keySchema(entity), ReferenceFixtures.valueSchemas(entity))
    val got = readV2()
    assert(got.schema.map(_.name) == Seq("offset", "key", "value"))
    val e = expected.orderBy("offset").collect().map(_.toString).toSeq
    val g = got.orderBy("offset").collect().map(_.toString).toSeq
    assert(g == e)
  }

  test("tombstones arrive as null values") {
    val tombs = readV2().where(col("value").isNull).count()
    val expected = FixtureReader.readTopic(spark, path,
        ReferenceFixtures.keySchema(entity), ReferenceFixtures.valueSchemas(entity))
      .where(col("value").isNull).count()
    assert(tombs == expected && tombs > 0)
  }

  test("column pruning reaches the scan (nested ReadSchema)") {
    val pruned = readV2().select(col("value.title"))
    val readSchema = pruned.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan.readSchema()
    }.get
    assert(readSchema.fieldNames.toSeq == Seq("value"), s"got $readSchema")
    val valueStruct = readSchema("value").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(valueStruct.fieldNames.toSeq == Seq("title"),
      s"nested pruning missed: ${valueStruct.toDDL}")
    // and the pruned read still returns correct data
    val titles = pruned.na.drop().collect().map(_.getString(0)).toSet
    assert(titles.nonEmpty)
  }

  test("splits partition the log with stable global offsets") {
    val one = readV2(splits = 1)
    val many = readV2(splits = 5)
    assert(many.rdd.getNumPartitions == 5)
    assert(one.rdd.getNumPartitions == 1)
    assert(many.orderBy("offset").collect().map(_.toString).toSeq ==
      one.orderBy("offset").collect().map(_.toString).toSeq)
    // latest-per-key over the v2 source is partition-count invariant
    def latest(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Compaction.latest(
          df.select(col("offset"), col("key.id").as("id"), col("value")),
          Seq("id"), "offset")
        .orderBy("offset").collect().map(_.toString).toSeq
    assert(latest(many) == latest(one))
  }
}
