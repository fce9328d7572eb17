package graft.tools

import graft.engine.GraftSession
import graft.queries.Catalog

/** Interleaved A/B for the r16 count-table percentile plan (ADVICE r15):
  * per query, alternate `spark.graft.pctCountTable` between true (count
  * table feeding percentile(v, qs, cnt)) and false (direct builtin over raw
  * rows) on every run, so host drift hits both arms equally. Prints
  * best-of-N per arm and the delta.
  *
  * Args: query names (defaults to the exactPercentiles call sites).
  */
object PctProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rounds = sys.env.getOrElse("GRAFT_PROBE_ROUNDS", "5").toInt
    val spark = GraftSession.getOrCreate("graft-pct-probe")

    def runOnce(name: String, ct: Boolean): Double = {
      spark.conf.set("spark.graft.pctCountTable", ct.toString)
      val t0 = System.nanoTime()
      Catalog.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    val names = if (args.nonEmpty) args.toSeq
      else Seq("x33_percentiles", "x67_winsorize")
    println(f"${"query"}%-28s ${"ctable"}%8s ${"direct"}%8s ${"delta"}%8s")
    var totC = 0.0; var totD = 0.0
    names.foreach { name =>
      System.gc()
      runOnce(name, ct = true); runOnce(name, ct = false) // warm both arms
      val (cs, ds) = (1 to rounds).foldLeft((List.empty[Double], List.empty[Double])) {
        case ((c, d), _) => (runOnce(name, ct = true) :: c, runOnce(name, ct = false) :: d)
      }
      val (bc, bd) = (cs.min, ds.min)
      totC += bc; totD += bd
      println(f"$name%-28s $bc%8.3f $bd%8.3f ${bc - bd}%+8.3f")
    }
    println(f"${"TOTAL"}%-28s $totC%8.3f $totD%8.3f ${totC - totD}%+8.3f")
    spark.stop()
  }
}
