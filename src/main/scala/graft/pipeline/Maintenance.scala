package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Table maintenance for hive-partitioned parquet: small-file compaction.
  *
  * Streaming/incremental writers (the reference's daily appends, the
  * [[Merge]] upsert sink, any micro-batching ingest) accumulate many small
  * files per partition; parquet scan throughput then dies on footer/open
  * overhead long before data volume matters. Compaction rewrites ONLY the
  * partitions whose file count crossed the threshold — untouched partitions
  * stay byte-identical (same contract as [[Merge.upsertByKey]], proven in
  * spec), so the operation is safe to run continuously beside readers of
  * other partitions.
  *
  * WRITER EXCLUSION (required): compaction is read-then-overwrite on the
  * partitions it touches — rows written to one of those partitions by a
  * CONCURRENT writer (e.g. the upsert sink merging into the same date)
  * between the snapshot read and the overwrite would be lost. Raw-parquet
  * layouts have no transaction log to detect the conflict, so the operator
  * must be scheduled when no writer can touch the candidate partitions
  * (e.g. compact only partitions older than the stream's watermark — closed
  * dates a date-partitioned CDC feed no longer updates). */
object Maintenance {

  /** Rewrite every partition of `path` that holds at least `minFiles`
    * parquet files into a single file per partition (hash-clustered by the
    * partition column, so each value's rows land in one writer task).
    * Returns the compacted partition values. Partitions beyond one target
    * file's worth of data would add a salt column to fan out writers — at
    * that point the partition grain itself is usually wrong. */
  def compactPartitions(spark: SparkSession, path: String, partitionCol: String,
                        minFiles: Int = 2): Seq[String] = {
    val fs = FileSystem.get(new java.net.URI(path),
      spark.sessionState.newHadoopConf())
    val prefix = s"$partitionCol="
    val dirs = fs.listStatus(new Path(path))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
    // directory names carry HIVE-ESCAPED partition values (':' → '%3A', the
    // null partition → __HIVE_DEFAULT_PARTITION__); the column filter needs
    // the UNESCAPED values or escaped/null partitions silently never match
    val esc = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val NullDir = "__HIVE_DEFAULT_PARTITION__"
    val rawNames = dirs.filter { d =>
      fs.listStatus(d.getPath)
        .count(_.getPath.getName.endsWith(".parquet")) >= minFiles
    }.map(_.getPath.getName.substring(prefix.length)).toSeq
    if (rawNames.isEmpty) return Nil
    val values: Seq[Any] = rawNames.filterNot(_ == NullDir)
      .map(esc.unescapePathName)
    val pred = Merge.partitionPredicate(col(partitionCol),
      if (rawNames.contains(NullDir)) values :+ null else values)
    // materialize before the write: Spark (correctly) refuses a plan that
    // reads from the same path it is overwriting
    val compacted = spark.read.parquet(path)
      .where(pred) // partition-pruned scan
      .repartition(col(partitionCol))
      .localCheckpoint()
    compacted.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path)
    rawNames.map(n => if (n == NullDir) n else esc.unescapePathName(n))
  }
}
