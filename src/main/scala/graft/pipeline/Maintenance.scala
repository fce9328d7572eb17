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

  /** NAMING CONTRACT for batch-partitioned state tables: a table whose rows
    * are aggregated COUNTS (so that readers SUM them and distinct() would
    * corrupt the sum) must name its count column here; presence-based claim
    * tables (digests/signatures/fingerprints/chunks/vectors) must NOT use
    * these names. [[foldHistory]]'s structural guard keys on this set — a
    * new count table whose column is missing here would be silently
    * corrupted by a provenance-less fold (ADVICE r10). Current members:
    * `n_kept`, the curation kept-counts shape
    * ([[IncrementalCuration.curateBatch]]'s budget state). */
  val AggregatedCountColumns: Set[String] = Set("n_kept")

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
    // reads from the same path it is overwriting.
    // mergeSchema: after a provenance [[foldHistory]] the label partition's
    // files carry `obatch` while unfolded partitions' files don't; the
    // default single-footer schema pick could then compact the label
    // partition THROUGH the narrower schema and silently drop the
    // provenance column — corrupting the (source, origin-batch) identity
    // the curation budget reader dedups on (lifecycle spec pins this).
    val compacted = spark.read.option("mergeSchema", "true").parquet(path)
      .where(pred) // partition-pruned scan
      .repartition(col(partitionCol))
      .localCheckpoint()
    compacted.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path)
    rawNames.map(n => if (n == NullDir) n else esc.unescapePathName(n))
  }

  /** Fold FINALIZED batch partitions of an incremental-state table
    * ([[IncrementalDedup]]'s digest/signature/fingerprint/chunk/vector
    * histories, [[IncrementalCuration]]'s kept-counts) into one
    * `batch=label` partition. A daily-ingest history otherwise grows one
    * hive partition per batch FOREVER — partition listing, not data
    * volume, becomes the bottleneck (the 100 TB failure mode this table
    * layout would hit first).
    *
    * The retry contract survives because the cross-batch readers exclude
    * only `batch =!= batchId`: rows moved under `label` remain visible as
    * history to every batch, and a batch still in `protect` keeps its own
    * partition so its redelivery keeps excluding its own claims.
    * `protect` MUST therefore contain every batch that may still be
    * redelivered (in the tiers' crash-retry model: the latest batch);
    * `label` must never collide with a real batch id.
    *
    * Crash-convergent BY SEMANTICS, no transaction log: the fold writes
    * the merged label partition first (dynamic overwrite touches only
    * `batch=label`), then deletes the folded partitions. A crash between
    * the two leaves rows duplicated under label AND their old partition —
    * harmless for CLAIM tables (presence-based semi/anti-join sources)
    * and collapsed by the next fold's `distinct`. For tables whose rows
    * are AGGREGATED by readers (kept-counts: summed), pass
    * `provenance = true`: each row keeps its origin batch in an `obatch`
    * column (cross-batch readers project specific columns, so the extra
    * column is invisible to them), making rows identity-carrying — the
    * crash-window duplicate is the same row twice, which `distinct`
    * removes on the retry, and the reader's SUM over the folded rows
    * stays exact AFTER the retry. A reader that sums INSIDE the crash
    * window must additionally dedup on the (key, coalesce(obatch, batch))
    * identity, or it double-counts rows present under both the label and
    * their not-yet-deleted old partition —
    * [[IncrementalCuration.curateBatch]]'s budget reader does exactly
    * this (ADVICE r9), so for the counts table the window is invisible
    * rather than an operational ordering requirement. Forgetting
    * `provenance = true` on such a table is a silent corruption
    * (distinct() collapses legitimately identical (source, n_kept) rows
    * from different batches), so it is guarded structurally below, not by
    * call-site discipline. Writer exclusion as in [[compactPartitions]].
    *
    * Returns the batch ids folded (empty when nothing qualified). */
  def foldHistory(spark: SparkSession, path: String, protect: Set[String],
                  label: String = "__folded__",
                  provenance: Boolean = false): Seq[String] = {
    require(!protect.contains(label),
      s"label '$label' cannot be a protected batch id")
    val fs = FileSystem.get(new java.net.URI(path),
      spark.sessionState.newHadoopConf())
    val root = new Path(path)
    if (!fs.exists(root)) return Nil
    val esc = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val prefix = "batch="
    val dirByValue: Map[String, String] = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .map(_.getPath.getName)
      .map(n => esc.unescapePathName(n.substring(prefix.length)) -> n)
      .toMap
    val candidates = dirByValue.keys
      .filterNot(protect).filterNot(_ == label).toSeq.sorted
    if (candidates.isEmpty) return Nil
    // mergeSchema: after a provenance fold the label partition's files
    // carry `obatch` while unfolded batch partitions don't — a plain read
    // would pick one file's schema at random
    val base = spark.read.option("mergeSchema", "true").parquet(path)
      .where(col("batch").isin((candidates :+ label).map(x => x: Any): _*))
    // Structural guard (ADVICE r9): an aggregated table folded without
    // provenance silently shrinks reader SUMs — drop(batch).distinct()
    // collapses legitimately distinct rows like (s1, n_kept=2) from two
    // different batches into one. The marker is the DECLARED
    // [[AggregatedCountColumns]] set (ADVICE r10: a literal "n_kept" here
    // would let a future count table under a different name bypass the
    // guard silently); claim tables (digests/signatures/fingerprints/
    // chunks/vectors) are presence-based and never carry any of them.
    val aggCols = base.columns.toSet.intersect(AggregatedCountColumns)
    require(provenance || aggCols.isEmpty,
      s"$path carries aggregated count column(s) ${aggCols.mkString(", ")}; " +
        "folding without provenance = true would corrupt reader SUMs")
    val merged = (if (provenance) {
        val withO =
          if (base.columns.contains("obatch"))
            base.withColumn("obatch", coalesce(col("obatch"), col("batch")))
          else base.withColumn("obatch", col("batch"))
        withO.drop("batch")
      } else base.drop("batch"))
      .distinct()
      // materialize before the write: same-path overwrite rule
      .localCheckpoint()
    merged.withColumn("batch", lit(label)).write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch").parquet(path)
    candidates.foreach(v => fs.delete(new Path(root, dirByValue(v)), true))
    candidates
  }
}
