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

  private def b(rows: (Long, String)*) = {
    import spark.implicits._
    rows.map { case (id, text) => (id, "s1", text, "m") }
      .toDF("doc_id", "source", "text", "meta")
  }
  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("doc_id").as[Long].collect().sorted.toSeq

  test("lifecycle: curate → fold → compact → curate; maintenance is " +
    "invisible — redelivery and the next delivery match a never-maintained " +
    "history (VERDICT r9 directive 4)") {
    val th = Seq(("s1", 0.5)).toDF("source", "thr")
    val b1 = b(13L -> "the dog of peace", 14L -> "the owl of night")
    val b2 = b(20L -> "the fox of dawn", 21L -> "the dog of peace")
    val b3 = b(22L -> "the elk of dusk", 23L -> "the owl of night")
    val hm = Files.createTempDirectory("graft_life_m").toString + "/h"
    val hn = Files.createTempDirectory("graft_life_n").toString + "/h"
    for (h <- Seq(hm, hn)) {
      assert(ids(IncrementalCuration.curateBatch(b1, h, "b1", th, 4))
        == Seq(13L, 14L))
      assert(ids(IncrementalCuration.curateBatch(b2, h, "b2", th, 4))
        == Seq(20L), "21 is a cross-batch dup of b1 content")
    }
    // maintain hm only: fold the finalized b1 (b2 may still redeliver),
    // then compact both state tables (minFiles = 1 forces a real rewrite
    // of every partition — including the label partition THROUGH the
    // merged schema; a single-footer schema pick here would drop obatch
    // and corrupt the budget identity)
    assert(Maintenance.foldHistory(spark, s"$hm/source_counts",
      protect = Set("b2"), provenance = true) == Seq("b1"))
    assert(Maintenance.foldHistory(spark, s"$hm/digests",
      protect = Set("b2")) == Seq("b1"))
    assert(Maintenance.compactPartitions(spark, s"$hm/source_counts",
      "batch", minFiles = 1).nonEmpty)
    assert(Maintenance.compactPartitions(spark, s"$hm/digests",
      "batch", minFiles = 1).nonEmpty)
    assert(spark.read.option("mergeSchema", "true")
        .parquet(s"$hm/source_counts").columns.contains("obatch"),
      "compaction must not strip the provenance column")
    // redeliver b2, then deliver b3, in BOTH histories — identical sets
    val r2m = ids(IncrementalCuration.curateBatch(b2, hm, "b2", th, 4))
    val r2n = ids(IncrementalCuration.curateBatch(b2, hn, "b2", th, 4))
    assert(r2m == Seq(20L) && r2n == Seq(20L),
      "redelivery reproduces the original survivors on both histories")
    val d3m = ids(IncrementalCuration.curateBatch(b3, hm, "b3", th, 4))
    val d3n = ids(IncrementalCuration.curateBatch(b3, hn, "b3", th, 4))
    assert(d3m == Seq(22L) && d3m == d3n,
      "23 dups folded b1 content; 22 takes the one remaining budget slot")
    for (h <- Seq(hm, hn))
      assert(spark.read.option("mergeSchema", "true")
          .parquet(s"$h/source_counts")
          .groupBy("source").sum("n_kept").as[(String, Long)]
          .collect().toSeq == Seq(("s1", 4L)),
        s"lifetime kept total must agree at $h")
  }

  test("fold crash window (label written, old partitions not yet deleted): " +
    "budgets must not double-count — the reader's identity dedup makes the " +
    "window invisible (ADVICE r9)") {
    val hist = Files.createTempDirectory("graft_fold_crash").toString + "/h"
    val th = Seq(("s1", 0.5)).toDF("source", "thr")
    assert(IncrementalCuration.curateBatch(
      b(13L -> "the dog of peace", 14L -> "the owl of night"),
      hist, "b1", th, 3).count() == 2)
    // reconstruct the exact crash state: snapshot batch=b1, run the fold
    // to completion (writes label, deletes b1), restore the snapshot —
    // now every b1 count row exists twice (old partition + label/obatch)
    val cp = s"$hist/source_counts"
    val save = Files.createTempDirectory("graft_fold_save").toFile
    def copyDir(src: java.io.File, dst: java.io.File): Unit = {
      dst.mkdirs()
      src.listFiles().foreach { f =>
        val t = new java.io.File(dst, f.getName)
        if (f.isDirectory) copyDir(f, t)
        else java.nio.file.Files.copy(f.toPath, t.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    copyDir(new java.io.File(s"$cp/batch=b1"), new java.io.File(save, "batch=b1"))
    assert(Maintenance.foldHistory(spark, cp, protect = Set.empty,
      provenance = true) == Seq("b1"))
    copyDir(new java.io.File(save, "batch=b1"), new java.io.File(s"$cp/batch=b1"))
    // b1's (s1, 2) row is now present under BOTH batch=b1 and the label;
    // a summing reader without identity dedup would see used = 4 ≥ cap
    // and keep nothing — permanently, since its own count row then
    // records the under-keep
    assert(ids(IncrementalCuration.curateBatch(
        b(20L -> "the fox of dawn"), hist, "b2", th, 3)) == Seq(20L),
      "used must be 2 (one b1 identity), not 4 (double-counted)")
    // the fold retry converges and the budget arithmetic stays exact
    assert(Maintenance.foldHistory(spark, cp, protect = Set("b2"),
      provenance = true) == Seq("b1"))
    assert(IncrementalCuration.curateBatch(
      b(22L -> "the elk of dusk"), hist, "b3", th, 3).count() == 0,
      "cap 3 fully consumed: 2 (b1) + 1 (b2)")
  }

  test("foldHistory structurally refuses provenance = false on an " +
    "aggregated (n_kept) table (ADVICE r9)") {
    val hist = Files.createTempDirectory("graft_fold_guard").toString + "/h"
    val th = Seq(("s1", 0.5)).toDF("source", "thr")
    IncrementalCuration.curateBatch(
      b(13L -> "the dog of peace"), hist, "b1", th, 3).count()
    IncrementalCuration.curateBatch(
      b(14L -> "the owl of night"), hist, "b2", th, 3).count()
    val e = intercept[IllegalArgumentException] {
      Maintenance.foldHistory(spark, s"$hist/source_counts",
        protect = Set("b2")) // provenance left at the false default
    }
    assert(e.getMessage.contains("n_kept"))
  }
}
