package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Maintenance

/** Small-file compaction: fragmented partitions collapse to one file,
  * healthy partitions are left byte-identical. */
class MaintenanceSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def parquetFiles(dir: String, p: String): Map[String, Long] = {
    import scala.collection.JavaConverters._
    Files.list(Paths.get(s"$dir/p=$p")).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(f => f.getFileName.toString -> Files.getLastModifiedTime(f).toMillis)
      .toMap
  }

  test("fragmented partition compacts to one file; healthy partition untouched") {
    val dir = Files.createTempDirectory("graft_compact").toString
    // p=frag: 4 appends -> 4 files; p=ok: one write -> 1 file
    for (i <- 1 to 4)
      Seq((i.toLong, s"v$i", "frag")).toDF("id", "v", "p")
        .coalesce(1).write.mode("append").partitionBy("p").parquet(dir)
    Seq((10L, "w", "ok")).toDF("id", "v", "p")
      .coalesce(1).write.mode("append").partitionBy("p").parquet(dir)

    assert(parquetFiles(dir, "frag").size == 4)
    val before = parquetFiles(dir, "ok")
    val before_data = spark.read.parquet(dir)
      .select("id", "v", "p").as[(Long, String, String)].collect().toSet

    val touched = Maintenance.compactPartitions(spark, dir, "p")
    assert(touched == Seq("frag"))
    assert(parquetFiles(dir, "frag").size == 1)
    assert(parquetFiles(dir, "ok") == before) // same names, same mtimes
    val after = spark.read.parquet(dir)
      .select("id", "v", "p").as[(Long, String, String)].collect().toSet
    assert(after == before_data)
  }

  test("no-op when every partition is already compact") {
    val dir = Files.createTempDirectory("graft_compact2").toString
    Seq((1L, "a", "d1"), (2L, "b", "d2")).toDF("id", "v", "p")
      .coalesce(1).write.mode("overwrite").partitionBy("p").parquet(dir)
    assert(Maintenance.compactPartitions(spark, dir, "p").isEmpty)
  }

  test("hive-escaped partition values compact (dir name != column value)") {
    val dir = Files.createTempDirectory("graft_compact3").toString
    for (i <- 1 to 3) // ':' is hive-escaped to %3A in the directory name
      Seq((i.toLong, s"v$i", "a:b")).toDF("id", "v", "p")
        .coalesce(1).write.mode("append").partitionBy("p").parquet(dir)
    val touched = Maintenance.compactPartitions(spark, dir, "p")
    assert(touched == Seq("a:b"))
    import scala.collection.JavaConverters._
    val files = Files.list(Paths.get(s"$dir/p=a%3Ab")).iterator().asScala
      .count(_.getFileName.toString.endsWith(".parquet"))
    assert(files == 1)
    assert(spark.read.parquet(dir).count() == 3) // no rows lost
  }
}
