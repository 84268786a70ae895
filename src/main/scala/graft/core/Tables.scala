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

  /** Fallback schema for the ORIGINAL events generator, which wrote
    * `ts` as parquet TIMESTAMP(NANOS) — a type Spark's reader rejects,
    * so it must be read as the raw epoch-nanos int64 via explicit
    * schema. The current generator writes TIMESTAMP(MICROS), which
    * Spark infers as TimestampType. */
  private val eventsNanosSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // epoch nanoseconds
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Every query and DuckDB oracle in this repo treats `events.ts` as
    * an epoch-NANOSECONDS Long (the `epoch_ns(ts)` convention).
    * Normalize whatever the generator wrote to that unit: a
    * TimestampType read (TIMESTAMP MICROS file) scales µs → ns; a
    * LongType read (TIMESTAMP NANOS file via [[eventsNanosSchema]]) is
    * already ns. Anything else fails loudly — a silent unit change
    * would corrupt every event-time result by 1000×. */
  private def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    df.schema("ts").dataType match {
      case TimestampType =>
        df.withColumn("ts", unix_micros(col("ts")) * 1000L)
      case TimestampNTZType => // naive µs; session tz is UTC everywhere,
        // so the cast to instant preserves the stored value (DuckDB's
        // epoch_ns over the same naive column agrees)
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case LongType => df
      case other => sys.error(s"events.ts has unexpected type $other")
    }
  }

  /** Batch read of events with `ts` left in the file's native type
    * (TimestampType for the current generator, raw-ns Long for the
    * original one) — callers normalize via [[normalizeTs]].
    *
    * The nanos-schema fallback fires ONLY on Spark's specific
    * TIMESTAMP(NANOS) schema-inference rejection
    * (`[PARQUET_TYPE_ILLEGAL] Illegal Parquet type: INT64
    * (TIMESTAMP(NANOS, …))`). Catching more than that was a latent
    * unit bug: if the inferred read of a TIMESTAMP(MICROS) file failed
    * transiently (I/O, corrupt footer), the fallback would read the
    * INT64 micros as raw longs, which [[normalizeTs]] passes through
    * as NANOseconds — a silent 1000x corruption of every event-time
    * result. Any other failure now surfaces as the original reader
    * error. */
  private def rawEvents(spark: SparkSession, path: String): DataFrame =
    try spark.read.parquet(path)
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition == "PARQUET_TYPE_ILLEGAL" =>
        spark.read.schema(eventsNanosSchema).parquet(path)
    }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") normalizeTs(rawEvents(spark, s"$dir/$name.parquet"))
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
      if (name == "events") rawEvents(spark, s"$dir/$name.parquet").schema
      else spark.read.parquet(s"$dir/$name.parquet").schema
    val s = spark.readStream.schema(sch).option("basePath", dir)
      .parquet(s"$dir/{$name}.parquet")
    if (name == "events") normalizeTs(s) else s
  }

  /** Loader closure over one scale-factor directory. */
  def loader(spark: SparkSession, dir: String): String => DataFrame =
    name => load(spark, dir, name)
}
