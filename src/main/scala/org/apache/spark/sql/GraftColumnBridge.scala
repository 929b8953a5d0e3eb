package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Bridge to the package-private Column <-> catalyst Expression
 * converters (Spark 4 moved them behind `classic.ExpressionUtils`,
 * which is private[sql]). Same pattern as other Spark extension
 * libraries that expose custom Catalyst expressions as Columns.
 */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** The session's UUID (`sessionUUID` is private[sql]): unique per
   *  session and never reused — unlike an identity hash — so
   *  session-scoped caches can't alias a stopped session's slot. */
  def sessionUUID(spark: SparkSession): String =
    spark.asInstanceOf[classic.SparkSession].sessionUUID
}
