package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row-level MERGE (upsert) into a hive-partitioned parquet table — the
  * generalization of the reference's partition-level re-run story
  * (dynamic overwrite, dags/rocket_launch_etl.py:105-111 semantics fixed in
  * LaunchPipeline C6) down to individual keys.
  *
  * Scale shape: only the partitions PRESENT IN THE UPDATES are touched.
  * The touched-partition values are collected (bounded: a merge batch spans
  * few partitions) and pushed as a partition-pruning filter, so the target
  * scan reads exactly those directories; every untouched partition's files
  * are left byte-identical on disk. Within the touched partitions the merge
  * is one left-anti join (target rows whose key has no update survive) plus
  * a union with the updates — no full-table rewrite, no row-by-row I/O.
  */
object Merge {

  /** Upsert `updates` into the partitioned parquet table at `path`.
    * A target row is replaced when a row with the same `key` exists in
    * `updates` (last-write-wins within `updates` is the caller's contract:
    * pre-deduplicate if a batch can carry several rows per key); rows with
    * new keys are inserted into their partition. Returns the number of
    * partitions rewritten. */
  def upsertByKey(spark: SparkSession, path: String, updates: DataFrame,
                  key: String, partitionCol: String): Int = {
    val parts = updates.select(partitionCol).distinct().collect()
      .map(_.get(0))
    if (parts.isEmpty) return 0
    val target = spark.read.parquet(path)
      .where(col(partitionCol).isin(parts: _*)) // partition-pruned scan
    val survivors = target.join(
      updates.select(col(key)).distinct(), Seq(key), "left_anti")
    // materialize before the write: Spark (correctly) refuses a plan that
    // reads from the same path it is overwriting
    val merged = survivors.unionByName(updates).localCheckpoint()
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path)
    parts.length
  }
}
