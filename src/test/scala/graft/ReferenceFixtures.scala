package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

import graft.operators.Filters.{FilterMode, RecordFilter}
import graft.sources.FixtureReader

/** Schemas, filter, and loaders for the reference's test corpus
  * (/root/reference/test-resources — pure-JSON fixtures reused
  * verbatim; formats documented in /root/repo/FIXTURES.md).
  */
object ReferenceFixtures {

  val root = "/root/reference/test-resources"

  private def s(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t) })

  /** Value schemas per entity (numerics as Long; JSON loader infers). */
  val valueSchemas: Map[String, StructType] = Map(
    "user" -> s("user_id" -> LongType, "user_name" -> StringType,
      "email" -> StringType, "usage_type" -> StringType),
    "playlist" -> s("id" -> LongType, "active" -> LongType, "user_id" -> LongType,
      "type" -> StringType, "title" -> StringType),
    "playlist_tag" -> s("playlist_id" -> LongType, "user_tag_id" -> LongType,
      "tag_type" -> StringType),
    "user_tag" -> s("id" -> LongType, "user_id" -> LongType, "tag_name" -> StringType),
    "playlist_custom_params" -> s("id" -> LongType, "playlist_id" -> LongType,
      "name" -> StringType, "value" -> StringType),
    "playlist_media" -> s("id" -> LongType, "playlist_id" -> LongType,
      "pos" -> LongType, "media_id" -> LongType),
    "media" -> s("id" -> LongType, "status" -> StringType, "user_id" -> LongType,
      "title" -> StringType),
    "player" -> s("id" -> LongType, "user_id" -> LongType, "name" -> StringType))

  /** Key field names per entity, sorted (canonical composite order). */
  val keyFields: Map[String, Seq[String]] = Map(
    "user" -> Seq("user_id"),
    "playlist" -> Seq("id"),
    "playlist_tag" -> Seq("playlist_id", "user_tag_id"),
    "user_tag" -> Seq("id"),
    "playlist_custom_params" -> Seq("id"),
    "playlist_media" -> Seq("id"),
    "media" -> Seq("id"),
    "player" -> Seq("id"))

  def keySchema(entity: String): StructType = {
    val vs = valueSchemas(entity)
    StructType(keyFields(entity).map(f => vs(f)))
  }

  /** The reference TestFilter's semantics
    * (src/test/java/com/jwplayer/southpaw/filter/TestFilter.java:32-54):
    * media.status == "deleted" → DELETE;
    * playlist_custom_params.value == "INVALID" → DELETE;
    * user.name == "skip" → SKIP (note: the field is literally "name",
    * which user records don't carry — faithful to the reference). */
  val testFilter: RecordFilter = new RecordFilter {
    private def field(r: Row, name: String): Any =
      if (r.schema != null && r.schema.fieldNames.contains(name)) r.getAs[Any](name)
      else null
    override def filter(entity: String, record: Row, old: Option[Row]): FilterMode =
      entity match {
        case "media" if field(record, "status") == "deleted" => FilterMode.Delete
        case "playlist_custom_params" if field(record, "value") == "INVALID" =>
          FilterMode.Delete
        case "user" if field(record, "name") == "skip" => FilterMode.Skip
        case _ => FilterMode.Update
      }
  }

  /** Load one entity's topic fixture as a changelog DataFrame. */
  def changelog(spark: SparkSession, entity: String): DataFrame =
    FixtureReader.readTopic(spark, s"$root/topic/$entity.json",
      keySchema(entity), valueSchemas(entity))

  private val mapper = new ObjectMapper()

  /** Golden denormalized output: key → final doc JsonNode (null doc =
    * tombstone; last occurrence per key wins, matching
    * TestHelper.readDenormalizedData). */
  def goldenDocs(name: String): Map[Long, Option[JsonNode]] = {
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$root/topic/$name.json")).asScala.toSeq
    lines.grouped(2).collect { case Seq(k, v) =>
      k.trim.toLong -> (if (v.trim == "null") None else Some(mapper.readTree(v)))
    }.toMap
  }

  /** Normalize a Jackson tree to comparable Scala values: object field
    * order ignored, integral numbers widened to Long, floats to Double. */
  def normalize(n: JsonNode): Any = {
    if (n == null || n.isNull) null
    else if (n.isObject)
      n.properties().asScala.map(e => e.getKey -> normalize(e.getValue)).toMap
    else if (n.isArray) n.elements().asScala.map(normalize).toList
    else if (n.isIntegralNumber) n.asLong()
    else if (n.isNumber) n.asDouble()
    else if (n.isBoolean) n.asBoolean()
    else n.asText()
  }

  def normalizeJson(s: String): Any = normalize(mapper.readTree(s))
}
