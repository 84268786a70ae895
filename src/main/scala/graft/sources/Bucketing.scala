package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffle entity tables by their join key
  * once at write time so every subsequent denormalization join reads
  * co-located buckets and skips the exchange entirely.
  *
  * At 100 TB this is the difference between shuffling the fact table
  * on every query and shuffling it once at ingest: a relation tree
  * whose entities are bucketed by their join keys compiles to joins
  * with NO Exchange on the pre-bucketed sides (verified in
  * BucketingSpec by asserting the physical plan), so only the small
  * deltas move at query time. The reference gets the same effect from
  * RocksDB key order; this is the Spark-native equivalent.
  */
object Bucketing {

  /** Write a DataFrame as a bucketed managed table. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
