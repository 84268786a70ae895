package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.QueryDef

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are defined in `graft.queries.*` as [[graft.core.QueryDef]]s
  * (Spark implementation + optional DuckDB oracle SQL); this object
  * flattens them into the driver's expected shape.
  */
object SparkEntry {

  /** All registered queries, keyed by name. */
  def registry: Map[String, QueryDef] = graft.queries.Registry.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry("q_denorm_docs").build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, q) => k -> q.build }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, q) if q.oracle.isDefined => k -> q.oracle.get }
}