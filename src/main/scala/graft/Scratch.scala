package graft

import org.apache.spark.sql.functions._

import graft.engine.GraftSession
import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** Throwaway local profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-scratch")
    val emb = Tables(spark, sfDir, "embeddings")

    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      val t1 = System.nanoTime(); f
      val best = math.min(t1 - t0, System.nanoTime() - t1)
      println(f"[scratch] $name%-28s ${best / 1e9}%.3f s")
    }
    def noopSave(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val keyed = Similarity.withBandKeys(emb)
    val rows = keyed.select(col("vec_id"),
        explode(array((0 until Similarity.Bands).map(b =>
          struct(lit(b).as("band"), col(s"k$b").as("key"))): _*)).as("bk"))
      .select(col("vec_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val cand = rows.as("l").join(rows.as("r"),
      col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
        col("l.vec_id") < col("r.vec_id"))
    println(s"[scratch] x34 candidate rows (with band dups) = ${cand.count()}")

    time("withBandKeys") { noopSave(keyed) }
    time("x34 full") { noopSave(Dedup.embeddingNearDupLsh(emb, 0.3)) }
    time("x34 sorted") {
      noopSave(Dedup.embeddingNearDupLsh(emb, 0.3).orderBy("a", "b"))
    }
    time("x22 full") { noopSave(Similarity.lshTopK(emb, 5L, 3).orderBy("qid", "rn")) }
    spark.stop()
  }
}
