package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Bridge to the session's `private[sql]` function registry, so the
  * library's Catalyst expressions can be registered as SQL functions
  * on an ALREADY RUNNING session (the `SparkSessionExtensions` path in
  * [[graft.GraftExtensions]] covers sessions built with
  * `spark.sql.extensions`).
  */
object FunctionRegistryBridge {
  def register(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
}
