package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Streaming curation composite (content dedup → offline-threshold gate →
  * per-source lifetime cap in ONE stateful operator): within-batch and
  * cross-batch digest claims, claims from GATED-OUT docs (stage order),
  * cap admission in (ts, doc_id) order, lifetime cap persistence across
  * micro-batches, unknown-source/token-free gate population rules.
  *
  * Fixtures share IncrementalCurationSpec's quality arithmetic: 4-token
  * docs with 2 en-stopword hits score 0.5798, 0 hits 0.3367 — thr 0.5
  * splits them. */
class StreamingCurationSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("dedup claims (incl. gated-out docs) + gate + lifetime cap " +
    "across micro-batches") {
    def ts(min: Int) = new Timestamp(1704067200000L + min * 60000L)
    val dir = Files.createTempDirectory("graft_scur").toString
    val thr = Seq(("s1", 0.5)).toDF("source", "thr")

    val b1 = Seq(
      (10L, "s1", "the cat of war", ts(1)),  // pass → kept (slot 1)
      (11L, "s1", "the cat of war", ts(2)),  // within-batch dup → dropped
      (12L, "s1", "zz yy xx ww", ts(3)),     // 0.3367 < thr → gated; CLAIMS
      (13L, "s1", "the dog of peace", ts(4)),// pass → kept (slot 2)
      (14L, "s1", "the owl of night", ts(5)) // pass, cap 2 reached → dropped
    )
    val b2 = Seq(
      (20L, "s1", "the cat of war", ts(11)), // cross-batch dup → dropped
      (21L, "s1", "zz yy xx ww", ts(12)),    // dup of GATED-OUT 12 → dropped
      (22L, "sX", "qq ww ee rr", ts(13)),    // unknown source, −∞ → kept
      (23L, "sX", "   ", ts(14)),            // token-free → gated
      (24L, "s1", "the elk of dusk", ts(15)) // pass, s1 budget spent → dropped
    )
    val schema = (b1 ++ b2).toDF("doc_id", "source", "text", "ts").schema
    b1.toDF("doc_id", "source", "text", "ts").coalesce(1)
      .write.parquet(s"$dir/b1")
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
    val q = EventStreams.streamingCuration(src, thr, capPerSource = 2)
      .writeStream.outputMode("append")
      .format("memory").queryName("scuration").start()
    try {
      q.processAllAvailable()
      val after1 = spark.table("scuration").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(after1 == Seq(10L, 13L),
        "batch 1: dedup drops 11, gate drops 12, cap 2 admits 10 and 13")
      b2.toDF("doc_id", "source", "text", "ts").coalesce(1)
        .write.parquet(s"$dir/b2")
      q.processAllAvailable()
      val after2 = spark.table("scuration").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(after2 == Seq(10L, 13L, 22L),
        "batch 2: claims block 20 AND 21 (gated-out originals still " +
          "claim), the lifetime cap blocks 24, unknown source 22 passes " +
          "at −∞, token-free 23 is gated")
      // emitted rows carry the quality the corpus append wants
      val q22 = spark.table("scuration").where(col("doc_id") === 22L)
        .select("quality").head.getDouble(0)
      assert(q22 == 0.3367)
    } finally q.stop()

    // strict default quarantines the unknown source instead
    val dir2 = Files.createTempDirectory("graft_scur2").toString
    Seq((22L, "sX", "qq ww ee rr", ts(1)))
      .toDF("doc_id", "source", "text", "ts").coalesce(1)
      .write.parquet(s"$dir2/b1")
    val src2 = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir2/*")
    val q2 = EventStreams.streamingCuration(src2, thr, capPerSource = 2,
        defaultThr = Double.MaxValue)
      .writeStream.outputMode("append")
      .format("memory").queryName("scuration2").start()
    try {
      q2.processAllAvailable()
      assert(spark.table("scuration2").count() == 0)
    } finally q2.stop()

    intercept[IllegalArgumentException](
      EventStreams.streamingCuration(
        spark.readStream.schema(schema).parquet(s"$dir/*"), thr, 0))
  }
}
