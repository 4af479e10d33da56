package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to Spark's `private[sql]` Column <-> Expression
  * converters, needed to expose custom Catalyst expressions (e.g.
  * [[graft.functions.DotProduct]]) as user-facing `Column`s on
  * Spark 4.x, where `Column` wraps a ColumnNode rather than an
  * Expression directly.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
