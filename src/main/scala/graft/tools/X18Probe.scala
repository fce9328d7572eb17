package graft.tools

import org.apache.spark.sql.functions._

import graft.engine.GraftSession
import graft.operators.Dedup
import graft.sources.Tables

/** Scratch profiler for the x18 minhash verify shape: attributes time between
  * signature aggregation, group-level band-join candidate volume, and
  * verification, to target the dominant stage. */
object X18Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("x18probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, dir)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    for (round <- 1 to 3) {
      println(s"[probe] --- round $round")
      val sigOf = docs.select(col("doc_id"),
          graft.functions.TextHashFunctions.minhashSig(col("text")).as("sig"))
        .where(col("sig").isNotNull)
      val groups = sigOf.groupBy("sig").agg(collect_list("doc_id").as("ids"))
      val nGroups = time("sig agg count")(groups.count())
      println(s"[probe] distinct sigs: $nGroups")

      val keyed = groups.select(col("sig") +: col("ids") +:
        Dedup.bandKeyCols(col("sig")): _*)
      val bandRows = keyed.select(col("sig"), col("ids"),
        explode(array((0 until Dedup.Bands).map(b =>
          struct(lit(b).as("band"), col(s"k$b").as("bkey"))): _*)).as("bk"))
        .select(col("sig"), col("ids"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
      val l = bandRows.select(col("band"), col("bkey"), col("sig").as("sig_a"))
      val r = bandRows.select(col("band"), col("bkey"), col("sig").as("sig_b"))
      val rawPairs = time("group band-join raw pair count") {
        l.join(r, Seq("band", "bkey")).count()
      }
      println(s"[probe] group band-pair rows (incl self, both orders): $rawPairs")

      time("full x18 (noop)") {
        Dedup.minhashNearDupPairs(docs, 0.9).write
          .mode("overwrite").format("noop").save()
      }
      val outRows = time("output count") {
        Dedup.minhashNearDupPairs(docs, 0.9).count()
      }
      println(s"[probe] output pair rows: $outRows")
      time("reportSort tail (repartition(1)) noop") {
        Dedup.minhashNearDupPairs(docs, 0.9)
          .repartition(1).sortWithinPartitions(col("a"), col("b"))
          .write.mode("overwrite").format("noop").save()
      }
      time("parallel range-sort tail (orderBy) noop") {
        Dedup.minhashNearDupPairs(docs, 0.9)
          .orderBy(col("a"), col("b"))
          .write.mode("overwrite").format("noop").save()
      }
      time("checkpointed pairs + orderBy noop") {
        val pairs = Dedup.minhashNearDupPairs(docs, 0.9).localCheckpoint(false)
        pairs.orderBy(col("a"), col("b"))
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
