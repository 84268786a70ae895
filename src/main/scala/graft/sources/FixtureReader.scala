package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Reader for the reference's topic fixture format: alternating lines
  * `keyJson \n valueJson`, where an empty value line is a tombstone
  * (reference: src/test/java/com/jwplayer/southpaw/TestHelper.java:100-112).
  * Line-pair index is the offset (records are consumed in file order).
  */
object FixtureReader {

  /** Parse a topic fixture file into a changelog DataFrame with columns
    * `offset: Long`, `key: struct`, `value: struct` (null = tombstone).
    */
  def readTopic(
      spark: SparkSession,
      path: String,
      keySchema: StructType,
      valueSchema: StructType): DataFrame = {
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path)).toArray(Array.empty[String])
    val pairs: Seq[(Long, String, Option[String])] =
      lines.grouped(2).zipWithIndex.collect {
        case (Array(k, v), i) =>
          (i.toLong, k, if (v.trim.isEmpty) None else Some(v))
        case (Array(k), i) => (i.toLong, k, None)
      }.toSeq
    import spark.implicits._
    pairs.toDF("offset", "key_json", "value_json")
      .select(col("offset"),
        from_json(col("key_json"), keySchema).as("key"),
        from_json(col("value_json"), valueSchema).as("value"))
  }
}
