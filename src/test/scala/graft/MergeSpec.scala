package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Merge

/** Row-level MERGE/upsert: updates replace same-key rows, inserts land in
  * their partition, and — the scale contract — partitions with no updates
  * are left byte-identical on disk. */
class MergeSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def freshTable(): String = {
    val dir = Files.createTempDirectory("graft_merge").toString
    Seq((1L, "a", "d1"), (2L, "b", "d1"), (3L, "c", "d2"), (4L, "d", "d3"))
      .toDF("id", "v", "p")
      .write.mode("overwrite").partitionBy("p").parquet(dir)
    dir
  }

  private def partitionFiles(dir: String, p: String): Map[String, Long] = {
    val d = Paths.get(s"$dir/p=$p")
    import scala.collection.JavaConverters._
    Files.list(d).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(f => f.getFileName.toString -> Files.getLastModifiedTime(f).toMillis)
      .toMap
  }

  test("upsert replaces matched keys, inserts new ones, touches only the " +
    "updates' partitions") {
    val dir = freshTable()
    val before = partitionFiles(dir, "d3")
    val updates = Seq((2L, "B2", "d1"), (9L, "new", "d2")).toDF("id", "v", "p")

    val touched = Merge.upsertByKey(spark, dir, updates, "id", "p")
    assert(touched == 2)

    val after = spark.read.parquet(dir)
      .select("id", "v", "p").as[(Long, String, String)].collect().toSet
    assert(after == Set(
      (1L, "a", "d1"), (2L, "B2", "d1"), // d1: key 2 replaced, key 1 kept
      (3L, "c", "d2"), (9L, "new", "d2"), // d2: insert
      (4L, "d", "d3"))) // d3: untouched

    // the untouched partition's files are byte-identical (same names, same
    // mtimes) — the merge never rewrote them
    assert(partitionFiles(dir, "d3") == before)
  }

  test("empty update batch is a no-op") {
    val dir = freshTable()
    val empty = Seq.empty[(Long, String, String)].toDF("id", "v", "p")
    assert(Merge.upsertByKey(spark, dir, empty, "id", "p") == 0)
    assert(spark.read.parquet(dir).count() == 4)
  }

  test("re-running the same merge is idempotent") {
    val dir = freshTable()
    val updates = Seq((2L, "B2", "d1")).toDF("id", "v", "p")
    Merge.upsertByKey(spark, dir, updates, "id", "p")
    Merge.upsertByKey(spark, dir, updates, "id", "p")
    val d1 = spark.read.parquet(dir).where(col("p") === "d1")
      .select("id", "v").as[(Long, String)].collect().toSet
    assert(d1 == Set((1L, "a"), (2L, "B2")))
  }

  test("null partition values upsert correctly (isNull arm of the pruning " +
    "predicate — survivors in the null partition are kept)") {
    val dir = Files.createTempDirectory("graft_merge_null").toString
    Seq((1L, "a", Some("d1")), (2L, "b", None), (3L, "c", None))
      .toDF("id", "v", "p")
      .write.mode("overwrite").partitionBy("p").parquet(dir)
    val updates = Seq((2L, "B2", None: Option[String])).toDF("id", "v", "p")
    Merge.upsertByKey(spark, dir, updates, "id", "p")
    val got = spark.read.parquet(dir)
      .select("id", "v").as[(Long, String)].collect().toSet
    // key 3 (null partition, not updated) must survive; key 2 replaced
    assert(got == Set((1L, "a"), (2L, "B2"), (3L, "c")))
  }

  test("null KEY rows upsert as one logical key (null-safe anti join — a " +
    "plain equi-join would duplicate them every merge)") {
    val dir = Files.createTempDirectory("graft_merge_nullkey").toString
    Seq((Some(1L), "a", "d1"), (None, "n0", "d1"))
      .toDF("id", "v", "p")
      .write.mode("overwrite").partitionBy("p").parquet(dir)
    val updates = Seq((None: Option[Long], "n1", "d1")).toDF("id", "v", "p")
    Merge.upsertByKey(spark, dir, updates, "id", "p")
    Merge.upsertByKey(spark, dir,
      Seq((None: Option[Long], "n2", "d1")).toDF("id", "v", "p"), "id", "p")
    val got = spark.read.parquet(dir)
      .select("v").as[String].collect().toSet
    // the null-key row is REPLACED each time, never accumulated
    assert(got == Set("a", "n2"))
  }

  test("partitionStableKeys=false removes a key's old copy when the update " +
    "moves it to another partition, and drops a fully-drained partition") {
    val dir = freshTable() // d1:{1,2} d2:{3} d3:{4}
    // key 2 moves d1->d2; key 4 moves d3->d2 (draining d3 entirely)
    val updates = Seq((2L, "B2", "d2"), (4L, "D2", "d2")).toDF("id", "v", "p")
    Merge.upsertByKey(spark, dir, updates, "id", "p",
      partitionStableKeys = false)
    val got = spark.read.parquet(dir)
      .select("id", "v", "p").as[(Long, String, String)].collect().toSet
    assert(got == Set(
      (1L, "a", "d1"), // d1 keeps its other key, loses key 2
      (2L, "B2", "d2"), (3L, "c", "d2"), (4L, "D2", "d2")))
    assert(!Files.exists(Paths.get(s"$dir/p=d3"))) // drained dir deleted
  }
}
