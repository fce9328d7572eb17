package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable relational building blocks (SURVEY.md §2.11 E1–E3, E10).
  * All are thin, declarative compositions — Catalyst picks the physical
  * strategy (broadcast vs sort-merge, AQE re-planning), which is exactly
  * what we want at 100 TB: no hand-scheduled execution.
  */
object Relational {

  /** Keep the latest row per key group (E3/E8 "dedup-keep-latest").
    * One shuffle on the partition keys; ranking is per-partition. */
  def dedupKeepLatest(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  /** Top-k rows per group with a deterministic total order. */
  def topKPerGroup(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int,
                   rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).where(col(rankCol) <= k)
  }

  /** Rows of `left` with no key match in `right` (E2). Planned as a
    * left-anti join — broadcastable when `right` is a dim table. */
  def antiJoinKeys(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String): DataFrame =
    left.join(right, left(leftKey) === right(rightKey), "left_anti")
}
