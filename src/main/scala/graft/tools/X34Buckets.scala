package graft.tools

import org.apache.spark.sql.functions._

import graft.engine.GraftSession
import graft.functions.{VectorFunctions => V}
import graft.operators.{Dedup, Similarity => S}
import graft.sources.Tables

/** x34 bucket-population probe: per-(band, key) sizes, the kernel-vs-join
  * routing split at the DEFAULT caps, and the candidate-pair volume
  * Σ c·(c−1)/2 — the quantity x34's runtime actually tracks (sf25 showed
  * 27× sf5 runtime on 25× the survivor pairs; this prints whether that is
  * kernel-route pair volume or hot-bucket join overhead). Output via
  * show() — nothing driver-side beyond the rendered report. */
object X34Buckets {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("x34buckets")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val emb = Tables.embeddings(spark, dir)
    val keyed = S.withBandKeys(emb)
      .select(col("vec_id") +: (0 until S.Bands).map(b => col(s"k$b")) :+
        V.asDouble(col("embedding")).as("v"): _*)
    // same (band, key) explode as Similarity.bandRows (private there)
    val sizes = keyed.withColumn("dm", size(col("v")))
      .select(col("dm"), explode(array((0 until S.Bands).map(b =>
        struct(lit(b).as("band"), col(s"k$b").as("key"))): _*)).as("bk"))
      .select(col("dm"), col("bk.band").as("band"), col("bk.key").as("key"))
      .groupBy("band", "key")
      .agg(count(lit(1)).as("c"), max(col("dm")).as("d"))
    val hotPred = col("c") > Dedup.MaxKernelCellRows ||
      col("c") * col("d") * 8L > Dedup.KernelCellBytes
    sizes.agg(
      count(lit(1)).as("n_buckets"),
      max(col("c")).as("max_bucket"),
      expr("approx_percentile(c, 0.99)").as("p99_bucket"),
      // DECIMAL(38,0) before the multiply (ADVICE r12): a long c·(c−1)
      // product overflows silently past c ≈ 4.3e9 and would misreport
      // the probe's headline number on a pathological bucket
      sum(col("c").cast("decimal(38,0)") * (col("c") - 1) / 2)
        .as("cand_pairs_total"),
      sum(when(hotPred, 1L).otherwise(0L)).as("n_hot"),
      sum(when(hotPred, col("c").cast("decimal(38,0)") * (col("c") - 1) / 2)
        .otherwise(lit(0L).cast("decimal(38,0)"))).as("cand_pairs_hot"))
      .show(false)
  }
}
