package graft.tools

import graft.engine.GraftSession
import graft.operators.Dedup
import graft.sources.Tables

/** x34 at an arbitrary cosine threshold — the production-τ measurement
  * named in VERDICT r13 residual 3: the corrected 100 TB posture argues
  * that τ ≥ 0.7 zeroes NATURAL near-dup survivors (the catalog's τ = 0.3
  * is a 2.4σ cut on random 64-dim cosines, which is what makes the
  * survivor output quadratic on any corpus), so one row on
  * `testdata_sf25nat` at τ = 0.7 turns that argument into data.
  *
  * Args: [tau] (default 0.7). Prints survivors, wall seconds and the
  * route taken. The survivor count IS the datum; wall is secondary (the
  * candidate volume is τ-independent — only the survivor materialization
  * and its sort collapse).
  */
object X34Tau {
  def main(args: Array[String]): Unit = {
    val tau = if (args.nonEmpty) args(0).toDouble else 0.7
    val spark = GraftSession.getOrCreate("x34tau")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val emb = Tables.embeddings(spark, dir)
    val t0 = System.nanoTime()
    val survivors = Dedup.embeddingNearDupLsh(emb, tau).count()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"[x34tau] dir=$dir tau=$tau%.2f survivors=$survivors " +
      f"wall=$wall%.1f s route=${Dedup.lastLshRoute}")
    spark.stop()
  }
}
