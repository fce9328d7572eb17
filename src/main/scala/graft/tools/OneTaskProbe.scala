package graft.tools

import graft.engine.GraftSession
import graft.queries.Catalog

/** Interleaved A/B for the r14 one-task floor fusion (same discipline as
  * [[AqeProbe]]): per query, alternate `spark.graft.oneTaskFloorBytes`
  * between the default gate and 0 (disabled) on every run, so host drift
  * hits both arms equally. Prints best-of-N per arm and the delta.
  *
  * Args: query names (defaults to the floor-class head set under study).
  */
object OneTaskProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rounds = sys.env.getOrElse("GRAFT_PROBE_ROUNDS", "5").toInt
    val spark = GraftSession.getOrCreate("graft-onetask-probe")

    def runOnce(name: String, fused: Boolean): Double = {
      spark.conf.set("spark.graft.oneTaskFloorBytes",
        if (fused) (16L << 20).toString else "0")
      val t0 = System.nanoTime()
      Catalog.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    val names = if (args.nonEmpty) args.toSeq
      else Seq("q05_daily_distinct", "q09_join_agg", "x28_approx_distinct",
        "x30_set_ops", "x33_percentiles")
    println(f"${"query"}%-28s ${"fused"}%8s ${"plain"}%8s ${"delta"}%8s")
    var totF = 0.0; var totP = 0.0
    names.foreach { name =>
      System.gc()
      runOnce(name, fused = true); runOnce(name, fused = false) // warm both arms
      val (fs, ps) = (1 to rounds).foldLeft((List.empty[Double], List.empty[Double])) {
        case ((f, p), _) => (runOnce(name, fused = true) :: f, runOnce(name, fused = false) :: p)
      }
      val (bf, bp) = (fs.min, ps.min)
      totF += bf; totP += bp
      println(f"$name%-28s $bf%8.3f $bp%8.3f ${bf - bp}%+8.3f")
    }
    println(f"${"TOTAL"}%-28s $totF%8.3f $totP%8.3f ${totF - totP}%+8.3f")
    spark.stop()
  }
}
