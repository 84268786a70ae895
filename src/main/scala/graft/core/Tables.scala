package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Entity/table registry over the driver's parquet testdata directory.
  *
  * Maps entity names to DataFrames (one parquet file per entity, see
  * /root/repo/TESTDATA.md) and records each entity's primary-key
  * columns — needed for canonical-PK encoding and child-array ordering
  * (reference: record/BaseRecord.java:59-75 sorts composite key fields
  * by name).
  */
object Tables {

  val tpch: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings")

  /** Primary-key columns per entity (composite keys listed sorted by name). */
  val primaryKeys: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey"),
    "nation" -> Seq("n_nationkey"),
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey"),
    "lineitem" -> Seq("l_linenumber", "l_orderkey"), // composite, name-sorted
    "events" -> Seq("event_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects; read it as epoch-nanos Long via explicit schema. */
  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // epoch nanoseconds
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events")
      spark.read.schema(eventsSchema).parquet(s"$dir/$name.parquet")
    else spark.read.parquet(s"$dir/$name.parquet")

  /** The same table as an UNBOUNDED file-source stream (the streaming
    * reader needs the schema up front; for non-events tables a batch
    * footer peek supplies it — metadata-only, no data scan). Each
    * table is a single parquet FILE, which needs two dodges: the
    * source path must be a GLOB (for a plain path FileStreamSource
    * force-overrides `basePath` with the path itself, then rejects it
    * for not being a directory), and `basePath` must name the parent
    * directory explicitly. A one-alternative brace glob matches
    * exactly the table file. */
  def loadStream(spark: SparkSession, dir: String, name: String): DataFrame = {
    val sch =
      if (name == "events") eventsSchema
      else spark.read.parquet(s"$dir/$name.parquet").schema
    spark.readStream.schema(sch).option("basePath", dir)
      .parquet(s"$dir/{$name}.parquet")
  }

  /** Loader closure over one scale-factor directory. */
  def loader(spark: SparkSession, dir: String): String => DataFrame =
    name => load(spark, dir, name)
}
