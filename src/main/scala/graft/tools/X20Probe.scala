package graft.tools

import org.apache.spark.sql.functions._

import graft.engine.GraftSession
import graft.sources.Tables

/** Scratch profiler for the x20 prefix-join shape (not part of the library
  * surface; used to attribute time between the hot-set job, candidate
  * generation, and verification). */
object X20Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("x20probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, dir)
    val tEff = 0.8 - 1e-4

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    val packed = docs.select(col("doc_id"),
        graft.functions.TextHashFunctions.shingleSet(col("text")).as("shs"))
      .withColumn("nsh", size(col("shs")))

    for (round <- 1 to 3) {
      println(s"[probe] --- round $round")
      // boundedRows, not a plain collect: the operator caps the driver set
      // at MaxBroadcastShingles for a reason, and the probe must not OOM
      // where the production path routes to the fallback
      val entries = time("df agg+collect") {
        graft.engine.Actions.boundedRows(
            packed.select(explode(col("shs")).as("sh"))
              .groupBy("sh").agg(count(lit(1)).as("df")),
            graft.operators.Dedup.MaxBroadcastShingles)
          .getOrElse(sys.error(
            "probe corpus exceeds the broadcast cap — use the fallback path"))
          .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      }
      println(s"[probe] distinct shingles: ${entries.length}")
      val dfMap = spark.sparkContext.broadcast(
        (entries.map(_._1), entries.map(_._2)))

      val prefix = packed.select(col("doc_id"), col("nsh"),
        explode(graft.functions.TextHashFunctions.shinglePrefix(
          col("shs"), dfMap, tEff)).as("sh"))
      val nCand = time("candidates (df-order broadcast prefix)") {
        prefix.as("l").join(prefix.as("r"),
            col("l.sh") === col("r.sh") && col("l.doc_id") < col("r.doc_id") &&
              greatest(col("l.nsh"), col("r.nsh")) * lit(tEff) <=
                least(col("l.nsh"), col("r.nsh")))
          .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
          .count()
      }
      println(s"[probe] candidates: $nCand")
      val full = time("full x20 (broadcast prefix)") {
        graft.operators.Dedup.ngramJaccardPairs(docs, 0.8).write
          .mode("overwrite").format("noop").save()
      }
      val fullOld = time("full x20 (windowed fallback = r2 plan)") {
        graft.operators.Dedup.ngramJaccardPairs(docs, 0.8, "text", 0).write
          .mode("overwrite").format("noop").save()
      }
      dfMap.destroy() // consumed within this round — don't accumulate ~MBs/round
      (full, fullOld)
    }
    spark.stop()
  }
}
