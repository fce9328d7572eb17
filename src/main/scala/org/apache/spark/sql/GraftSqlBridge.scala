package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's `private[sql]` Column↔Expression conversions, so
  * graft's custom Catalyst expressions (e.g. [[graft.functions.DotProduct]])
  * can be exposed as user-facing `Column`s. Standard extension idiom: the
  * object lives in the `org.apache.spark.sql` package purely for access; it
  * contains no Spark-derived code.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
