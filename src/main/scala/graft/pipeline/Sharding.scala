package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Training-shard writer — the terminal step of a training-data pipeline:
  * deterministically shuffle ([[Relational.shuffleShards]]), then write one
  * hive partition per shard with rows pos-sorted inside each file, so a
  * training loader streams `path/shard=k` file-sequentially in training
  * order.
  *
  * Scale shape: `shuffleShards` output is range-clustered by (shard, pos)
  * and sorted within partitions, which SATISFIES the partitioned write's
  * required child ordering (`FileFormatWriter` skips its dynamic-partition
  * sort when the ordering already leads with the partition column) — the
  * write adds no exchange and no sort; each task streams its (shard, pos)
  * range straight to parquet. A shard spanning multiple tasks yields
  * multiple pos-contiguous files; a reader restores order with a cheap
  * per-shard sort on pos (each shard is 1/nShards of the corpus — at shard
  * grain that sort is the loader's shuffle buffer, not a corpus sort).
  *
  * The returned manifest is derived from a READ-BACK of the written files,
  * not an echo of the input — a write audit: per shard,
  * rows == max(pos) == distinct pos count iff the shard landed complete
  * and duplicate-free, which [[verifyShards]] checks in one scan. */
object Sharding {

  /** Shuffle `df` into `nShards` training shards under `path`
    * (`shard=<k>/part-*.parquet`, pos-sorted within files). Returns the
    * audited manifest (shard, rows), shard-ascending. */
  def writeShards(df: DataFrame, idCol: String, nShards: Int, path: String,
                  parts: Int = 0): Seq[(Int, Long)] = {
    Relational.shuffleShards(df, idCol, nShards, parts)
      .drop("shard_rows")
      .write.partitionBy("shard").mode("overwrite").parquet(path)
    // expected per-shard counts come from the INPUT via a plain aggregate
    // (one cheap job — no two-pass), so the audit is independent of the
    // write path it checks
    val h = ((col(idCol) % lit(1000000007L)) * lit(2654435761L)) %
      lit(1000000007L)
    val expected = df.groupBy((h % nShards).cast("int").as("shard"))
      .count()
      .collect() // bounded: one row per shard
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).toSeq
    verifyShards(df.sparkSession, path, expected)
  }

  /** Write audit over a shard directory against independently-derived
    * per-shard row counts: one scan, one bounded aggregate. Catches a
    * missing shard, a lost file (prefix, suffix or interior — rows or
    * positions no longer match), and duplicated rows. Returns `expected`
    * once verified. */
  def verifyShards(spark: org.apache.spark.sql.SparkSession, path: String,
                   expected: Seq[(Int, Long)]): Seq[(Int, Long)] = {
    val audit = spark.read.parquet(path)
      .groupBy("shard")
      .agg(count(lit(1)).as("rows"), max("pos").as("max_pos"),
        count_distinct(col("pos")).as("distinct_pos"))
      .collect() // bounded: one row per shard
      .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    require(audit.keySet == expected.filter(_._2 > 0).map(_._1).toSet,
      s"shard set on disk ${audit.keySet.toSeq.sorted} != expected " +
        s"${expected.filter(_._2 > 0).map(_._1)}")
    expected.filter(_._2 > 0).foreach { case (shard, want) =>
      val (rows, maxPos, distinctPos) = audit(shard)
      require(rows == want && maxPos == want && distinctPos == want,
        s"shard=$shard is corrupt: $rows rows (want $want), max pos " +
          s"$maxPos, $distinctPos distinct positions")
    }
    expected
  }
}
