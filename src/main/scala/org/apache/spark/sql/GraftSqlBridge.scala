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

  /** Bounded top-k aggregate (`CollectTopK`): keeps at most `num` values of
    * `c` in a bounded priority queue — partial-agg friendly with state
    * capped at `num` elements per group regardless of group size, the
    * scale-safe alternative to `slice(sort_array(collect_list(..)), 1, k)`
    * (whose buffer grows with the group) and to a per-group ranking window
    * (whose sort serializes on hot keys). `reverse = true` keeps the k
    * SMALLEST values (ascending output order), `false` the k largest
    * (descending). NULL inputs are ignored (Collect semantics), so a
    * `when(cond, v)` child doubles as a filter. */
  def collectTopK(c: Column, num: Int, reverse: Boolean): Column =
    classic.ExpressionUtils.column(
      new catalyst.expressions.aggregate.CollectTopK(
        classic.ExpressionUtils.expression(c), num, reverse, 0, 0)
        .toAggregateExpression())

  /** Raw (unwrapped) `CollectTopK` for SQL-surface registration — the
    * analyzer wraps a builder-returned AggregateFunction itself. */
  def collectTopKExpr(child: Expression, num: Int,
                      reverse: Boolean): Expression =
    new catalyst.expressions.aggregate.CollectTopK(child, num, reverse, 0, 0)
}
