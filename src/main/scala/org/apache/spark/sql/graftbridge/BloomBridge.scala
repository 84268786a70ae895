package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Bridge to Spark's internal Bloom-filter expressions — the same pair
  * (`BloomFilterAggregate` / `BloomFilterMightContain`) that powers
  * Spark's own injected runtime join filters
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`). Exposed here
  * for EXPLICIT use by [[graft.operators.Dedup.bloomNovel]]: building a
  * corpus-wide membership sketch in one aggregation and probing it
  * map-side, instead of shuffling the corpus for an anti-join.
  */
object BloomBridge {

  /** Aggregate: build a Bloom filter over a LongType column (pass
    * `xxhash64(...)` of the content). Partial filters merge by bitwise
    * OR, so the build is map-side combinable — the corpus never
    * shuffles, only fixed-size filter blobs do. */
  def bloomAgg(hashed: Column, expectedItems: Long, numBits: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(hashed),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe. Spark requires `bloom` to be foldable or a
    * scalar subquery (see [[scalarSubquery]]); the probe itself is a
    * pure per-row predicate with no false negatives. */
  def mightContain(bloom: Column, hashed: Column): Column =
    ColumnBridge.column(new BloomFilterMightContain(
      ColumnBridge.expression(bloom), ColumnBridge.expression(hashed)))

  /** Wrap a one-row/one-column DataFrame as a scalar subquery
    * expression. The subquery executes once and its result ships to
    * executors with the task binary — the distributed alternative to
    * collecting the value to the driver and inlining a literal. */
  def scalarSubquery(df: DataFrame): Column =
    ColumnBridge.column(ScalarSubquery(
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.analyzed))
}
