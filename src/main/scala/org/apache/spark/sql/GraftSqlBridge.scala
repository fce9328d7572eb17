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

  /** Bloom-filter sketch aggregate over a LONG column (`BloomFilterAggregate`
    * — the expression behind Spark's own runtime row-level filtering).
    * Partial-agg friendly: each task folds its rows into a fixed-size bit
    * array and partials OR-merge, so the full scan reduces to ONE binary
    * value of `numBits/8` bytes with no shuffle of the raw values — the
    * property that makes it the 100 TB membership-prefilter primitive.
    * `expectedItems`/`numBits` must stay within the session's
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems`/`maxNumBits`
    * caps (4M / 2^26 by default) or analysis fails. */
  def bloomFilterAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    classic.ExpressionUtils.column(
      new catalyst.expressions.aggregate.BloomFilterAggregate(
        classic.ExpressionUtils.expression(c),
        catalyst.expressions.Literal(expectedItems),
        catalyst.expressions.Literal(numBits))
        .toAggregateExpression())

  /** Membership probe against a serialized bloom sketch
    * (`BloomFilterMightContain`). The bloom side must be foldable (e.g. a
    * `lit(bytes)` of a collected sketch) — Spark's own restriction; a NULL
    * bloom (empty input aggregate) probes to NULL, i.e. filters drop every
    * row, matching empty-set membership. No false negatives ever; false
    * positives at the sketch's fpp, so exact operators must re-verify. */
  def bloomMightContain(bloom: Column, value: Column): Column =
    classic.ExpressionUtils.column(
      catalyst.expressions.BloomFilterMightContain(
        classic.ExpressionUtils.expression(bloom),
        classic.ExpressionUtils.expression(value)))

  /** BINARY-typed literal that stays BinaryType even for null (a plain
    * `lit(null)` is NullType, which `might_contain` rejects). */
  def binaryLit(b: Array[Byte]): Column =
    classic.ExpressionUtils.column(
      catalyst.expressions.Literal(b, types.BinaryType))
}
