package graft.tools

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._

import graft.engine.GraftSession
import graft.functions.{TextAnalysis, TextHashFunctions}
import graft.pipeline.{IncrementalCuration, Maintenance}

/** Measure the curation PRODUCTION loop (VERDICT r10 directive 2): N
  * batches through [[IncrementalCuration.curateBatch]] with
  * [[Maintenance.foldHistory]] + [[Maintenance.compactPartitions]]
  * interleaved mid-run, reporting per-batch wall time and the state
  * tables' file-count/byte growth. The claim under test: per-batch cost
  * stays FLAT as history accumulates (state reads are partition-pruned +
  * O(sources) aggregates, never corpus-sized), and maintenance bounds the
  * listing growth.
  *
  * Batches are consecutive replica slices of the sf5 documents table
  * (each slice carries the corpus's own intra-replica duplicate classes,
  * plus genuine cross-batch dups via the k=0 identity replica), so the
  * dedup stage sees real work every batch. Thresholds are computed ONCE
  * from batch 0 as the reference corpus (the pinned-input contract) with
  * the gate's own scoring kernel.
  *
  * Args: [sfDir] [nBatches] [maintainEvery]
  * Defaults: /root/repo/testdata_sf5, 10 batches (5 replicas / 250k docs
  * each at sf5), maintenance after every 3rd batch.
  */
object CurationBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata_sf5")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(10)
    val maintainEvery = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = GraftSession.getOrCreate("graft-curationbench")

    val work = "/tmp/graft_curation_bench"
    val fs = FileSystem.get(new java.net.URI(work),
      spark.sessionState.newHadoopConf())
    fs.delete(new Path(work), true)
    val hist = s"$work/hist"
    val reports = s"$work/reports"

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // batches = uniform doc_id range slices (the make_sf1 layout shifts ids
    // per replica, so contiguous ranges = whole replicas; ids are dense)
    val span = docs.agg(max("doc_id")).head().getLong(0) + 1
    val total = docs.count()
    val rowsPerBatch = total / nBatches

    println(s"[curation-bench] sf=$sfDir total=$total rows, " +
      s"$nBatches batches × ~$rowsPerBatch rows, maintain every $maintainEvery")

    // thresholds from batch 0 (reference corpus): gate kernel's own scoring
    // same rounded bound as the loop's batch 0 (ADVICE r11: integer
    // division drifted the "thresholds from batch 0" contract by up to
    // one doc_id when span % nBatches != 0)
    val b0 = docs.where(col("doc_id") <
      lit(math.round(span.toDouble / nBatches)))
    val scored = b0
      .withColumn("__st", TextHashFunctions.langStats(col("text")))
      .withColumn("__n_tokens",
        element_at(col("__st"), TextAnalysis.profiles.length + 1).cast("int"))
      .withColumn("__en_hits", element_at(col("__st"), 1).cast("int"))
      .where(col("__n_tokens") > 0)
      .select(col("source"),
        expr(TextAnalysis.qualityScore("__n_tokens", "__en_hits")).as("quality"))
    val thresholds = TextAnalysis.discreteThreshold(scored, 300)
      .localCheckpoint()
    println(s"[curation-bench] thresholds: " +
      thresholds.collect().map(r => s"${r.get(0)}=${r.get(1)}").mkString(", "))

    def stateStats(): String = {
      def walk(p: Path): (Long, Long) = {
        if (!fs.exists(p)) return (0L, 0L)
        val it = fs.listFiles(p, true)
        var files = 0L; var bytes = 0L
        while (it.hasNext) {
          val f = it.next()
          if (f.getPath.getName.endsWith(".parquet")) {
            files += 1; bytes += f.getLen
          }
        }
        (files, bytes)
      }
      val (df, db) = walk(new Path(s"$hist/digests"))
      val (cf, cb) = walk(new Path(s"$hist/source_counts"))
      f"digests=$df files/${db / 1024}KiB counts=$cf files/${cb / 1024}KiB"
    }

    val capPerSource = (rowsPerBatch * nBatches / 4).toInt.max(1000)
    val times = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (k <- 0 until nBatches) {
      val lo = math.round(span.toDouble * k / nBatches)
      val hi = math.round(span.toDouble * (k + 1) / nBatches)
      val batch = docs.where(col("doc_id") >= lo && col("doc_id") < hi)
      val t0 = System.nanoTime()
      val kept = IncrementalCuration.curateBatch(
        batch, hist, s"b$k", thresholds, capPerSource,
        reportPath = reports)
      val n = kept.count()
      val secs = (System.nanoTime() - t0) / 1e9
      times += secs
      println(f"[curation-bench] batch b$k: $n%d kept, $secs%.2f s, ${stateStats()}")
      if ((k + 1) % maintainEvery == 0 && k + 1 < nBatches) {
        val tm0 = System.nanoTime()
        val foldedD = Maintenance.foldHistory(spark, s"$hist/digests",
          protect = Set(s"b$k"))
        val foldedC = Maintenance.foldHistory(spark, s"$hist/source_counts",
          protect = Set(s"b$k"), provenance = true)
        val compacted = Maintenance.compactPartitions(spark,
          s"$hist/digests", "batch")
        val tm = (System.nanoTime() - tm0) / 1e9
        println(f"[curation-bench] maintenance after b$k: folded " +
          s"${foldedD.size}+${foldedC.size} batches, compacted " +
          f"${compacted.size} partitions, $tm%.2f s, ${stateStats()}")
      }
    }
    val first = times.take(3).sum / 3
    val last = times.takeRight(3).sum / 3
    println(f"[curation-bench] per-batch mean first3=$first%.2f s " +
      f"last3=$last%.2f s ratio=${last / first}%.2f (flat ≈ 1.0)")
    spark.stop()
  }
}
