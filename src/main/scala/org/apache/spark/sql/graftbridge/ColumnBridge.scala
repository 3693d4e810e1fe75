package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to Spark's internal Column ↔ Catalyst Expression
  * conversions (`org.apache.spark.sql.classic.ExpressionUtils` is
  * `private[sql]` in Spark 4.x). This is the one sanctioned-shape shim for
  * exposing custom Catalyst expressions as user-facing Columns. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager conversion through the session's ColumnNode converter — unlike
    * [[expression]], this immediately yields real catalyst nodes (e.g. a
    * catalyst SortOrder for `col.desc`) instead of a lazy wrapper, which is
    * required when splicing expressions into a custom LogicalPlan. */
  def expressionEager(spark: org.apache.spark.sql.SparkSession, c: Column): Expression =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].expression(c)
}
