package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Sharding

/** Training-shard writer: deterministic layout, in-file training order, and
  * the read-back write audit (including its corruption-detection teeth). */
class ShardingSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def shardFiles(dir: String, shard: Int): Seq[String] = {
    import scala.collection.JavaConverters._
    Files.list(Paths.get(s"$dir/shard=$shard")).iterator().asScala
      .map(_.toString).filter(_.endsWith(".parquet")).toSeq
  }

  test("writeShards: complete manifest, hash order restored per shard, " +
    "pos-sorted files, idempotent overwrite") {
    val docs = graft.sources.Tables.documents(spark, SparkTestSession.sf0001)
      .select("doc_id", "source")
    val dir = Files.createTempDirectory("graft_shards").toString
    val manifest = Sharding.writeShards(docs, "doc_id", nShards = 4, dir)
    assert(manifest.map(_._1) == Seq(0, 1, 2, 3))
    assert(manifest.map(_._2).sum == 500L)

    // read-back in training order reproduces the hash order exactly
    val h = ((col("doc_id") % lit(1000000007L)) * lit(2654435761L)) %
      lit(1000000007L)
    for (shard <- 0 to 3) {
      val got = spark.read.parquet(s"$dir/shard=$shard")
        .orderBy("pos").select("doc_id").collect().map(_.getLong(0)).toSeq
      val want = docs.withColumn("__h", h)
        .where(col("__h") % 4 === shard)
        .orderBy(col("__h"), col("doc_id"))
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(got == want, s"shard $shard out of training order")
    }

    // every FILE is internally pos-sorted (the no-extra-sort write kept the
    // operator's (shard, pos) clustering) and non-shard columns survived
    for (shard <- 0 to 3; f <- shardFiles(dir, shard)) {
      val pos = spark.read.parquet(f).select("pos")
        .collect().map(_.getLong(0)).toSeq
      assert(pos == pos.sorted, s"file $f not pos-sorted")
    }
    assert(spark.read.parquet(dir).where(col("source").isNull).count() == 0)

    // overwrite re-run: identical data, identical manifest
    assert(Sharding.writeShards(docs, "doc_id", 4, dir) == manifest)

    // corruption teeth: drop one file from the largest shard → the audit
    // must throw (missing rows, or a missing shard if it was single-file)
    val victim = shardFiles(dir, manifest.maxBy(_._2)._1).head
    Files.delete(Paths.get(victim))
    val e = intercept[IllegalArgumentException](
      Sharding.verifyShards(spark, dir, manifest))
    assert(e.getMessage.contains("corrupt") ||
      e.getMessage.contains("shard set"))
  }
}
