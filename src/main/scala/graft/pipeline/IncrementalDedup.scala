package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental exact dedup across ingest batches — the production shape of
  * x17's one-shot exact dedup: each new batch is deduplicated WITHIN itself
  * (keep lowest doc_id per content digest) and AGAINST every earlier batch,
  * via a persistent digest table — the corpus itself is never re-read.
  *
  * Scale shape: everything shuffles 16-byte binary md5 digests, never text
  * (x85's discipline). The history read is a single-column scan of the
  * OTHER batches' partitions (the current batch's partition is pruned out
  * by the partition filter); the cross-batch check is a digest⋈digest
  * left-anti join (shuffled equi join — at web scale the history side
  * dwarfs the batch, exactly the asymmetry AQE's runtime broadcast handles
  * while a small history still fits).
  *
  * Retry contract (the C6 discipline): the digest table is hive-partitioned
  * by batch id and written with DYNAMIC partition overwrite, so re-running
  * a batch (after a crash anywhere in this method or downstream) replaces
  * only its own partition and — because its own digests are EXCLUDED from
  * the history read — returns the identical survivor set, not the empty
  * set a naive append-then-anti-join would produce on redelivery.
  * Concurrent writers to one history path are excluded by contract, as in
  * [[Maintenance.compactPartitions]].
  *
  * Near-duplicates across batches compose the same way with the signature
  * operators in [[graft.operators.Dedup]] — persist minhash/simhash
  * signatures instead of digests. */
object IncrementalDedup {

  /** Dedup `batch` (tagged `batchId`) within itself and against every
    * OTHER batch recorded under `historyPath`, record the survivors'
    * digests under `batch=batchId`, and return the surviving rows (all
    * input columns). First call bootstraps the history. */
  def dedupBatch(batch: DataFrame, historyPath: String, batchId: String,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val spark = batch.sparkSession
    val fs = FileSystem.get(new java.net.URI(historyPath),
      spark.sessionState.newHadoopConf())
    val digests = batch.select(col(idCol),
      unhex(md5(col(textCol))).as("dig"))
    // within-batch keep-first: one digest-keyed aggregate (no window sort)
    val firstPerDig = digests.groupBy("dig").agg(min(idCol).as(idCol))
    val fresh =
      if (fs.exists(new Path(historyPath)))
        firstPerDig.join(
          spark.read.parquet(historyPath)
            .where(col("batch") =!= batchId) // partition-pruned re-run guard
            .select("dig"),
          Seq("dig"), "left_anti")
      else firstPerDig
    // the fresh set is consumed twice (digest write + survivor join);
    // checkpoint so the dedup joins run once (x20's trick, slim rows only)
    val pinned = fresh.localCheckpoint(false)
    pinned.select("dig").withColumn("batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch").parquet(historyPath)
    batch.join(pinned.select(idCol), Seq(idCol), "left_semi")
  }
}
