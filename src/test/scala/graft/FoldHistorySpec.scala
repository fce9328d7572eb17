package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{IncrementalCuration, IncrementalDedup, Maintenance}

/** History folding for the incremental-state tables: finalized batch
  * partitions collapse into one `batch=label` partition while every
  * cross-batch reader (claims anti-joins, kept-count sums, protected-batch
  * redelivery) behaves identically — the partition-listing growth fix for
  * "one hive partition per ingest day, forever". */
class FoldHistorySpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def parts(path: String): Seq[String] =
    new java.io.File(path).listFiles().filter(_.isDirectory)
      .map(_.getName).toSeq.sorted

  test("claim-history fold: claims survive the fold, the protected batch " +
    "redelivers intact, repeated folds converge") {
    val hist = Files.createTempDirectory("graft_fold_dig").toString + "/h"
    def batch(rows: (Long, String)*) = rows.toDF("doc_id", "text")
    IncrementalDedup.dedupBatch(batch(10L -> "alpha", 20L -> "beta"), hist, "b1")
    IncrementalDedup.dedupBatch(batch(30L -> "gamma"), hist, "b2")
    val s3 = IncrementalDedup.dedupBatch(batch(40L -> "delta"), hist, "b3")
    assert(s3.count() == 1)

    assert(Maintenance.foldHistory(spark, hist, protect = Set("b3"))
      == Seq("b1", "b2"))
    assert(parts(hist) == Seq("batch=__folded__", "batch=b3"))
    // folded claims still claim: a dup of folded b1 content is dropped
    val s4 = IncrementalDedup.dedupBatch(
      batch(50L -> "alpha", 60L -> "epsilon"), hist, "b4")
    assert(s4.select("doc_id").as[Long].collect().toSeq == Seq(60L))
    // the protected batch still redelivers its original survivor set
    val s3r = IncrementalDedup.dedupBatch(batch(40L -> "delta"), hist, "b3")
    assert(s3r.count() == 1)
    // second fold absorbs b3+b4 into the SAME label (label itself is
    // re-read and re-written — distinct keeps the set semantics)
    assert(Maintenance.foldHistory(spark, hist, protect = Set.empty).sorted
      == Seq("b3", "b4"))
    assert(parts(hist) == Seq("batch=__folded__"))
    val s5 = IncrementalDedup.dedupBatch(
      batch(70L -> "delta", 80L -> "epsilon", 90L -> "zeta"), hist, "b5")
    assert(s5.select("doc_id").as[Long].collect().toSeq == Seq(90L),
      "claims from both folds must still suppress duplicates")
    // nothing left to fold → no-op
    assert(Maintenance.foldHistory(spark, hist, protect = Set("b5")) == Nil)
  }

  test("kept-count fold with provenance: sums stay exact, post-fold " +
    "budgets and protected-batch redelivery are unchanged") {
    val hist = Files.createTempDirectory("graft_fold_cnt").toString + "/h"
    val th = Seq(("s1", 0.5)).toDF("source", "thr")
    def b(rows: (Long, String)*) = rows
      .map { case (id, text) => (id, "s1", text, "m") }
      .toDF("doc_id", "source", "text", "meta")
    // b1 keeps 2 of cap 3, b2 keeps the remaining 1 (fixtures from
    // IncrementalCurationSpec's quality table)
    assert(IncrementalCuration.curateBatch(
      b(13L -> "the dog of peace", 14L -> "the owl of night"),
      hist, "b1", th, 3).count() == 2)
    assert(IncrementalCuration.curateBatch(
      b(20L -> "the fox of dawn"), hist, "b2", th, 3).count() == 1)

    assert(Maintenance.foldHistory(spark, s"$hist/source_counts",
      protect = Set("b2"), provenance = true) == Seq("b1"))
    assert(Maintenance.foldHistory(spark, s"$hist/digests",
      protect = Set("b2")) == Seq("b1"))
    // redelivery of the protected batch: excludes its own counts, sums
    // the folded b1 row → remaining 1 → same survivor
    assert(IncrementalCuration.curateBatch(
        b(20L -> "the fox of dawn"), hist, "b2", th, 3)
      .select("doc_id").as[Long].collect().toSeq == Seq(20L))
    // next batch: used = folded(2) + b2(1) = cap → keeps nothing, and a
    // dup of FOLDED b1 content is still dropped at stage 1
    assert(IncrementalCuration.curateBatch(
      b(22L -> "the elk of dusk", 23L -> "the dog of peace"),
      hist, "b3", th, 3).count() == 0)
    // provenance rows: one per (obatch, source), summing to the kept total
    val total = spark.read.parquet(s"$hist/source_counts")
      .groupBy("source").sum("n_kept").as[(String, Long)].collect().toSeq
    assert(total == Seq(("s1", 3L)))
  }
}
