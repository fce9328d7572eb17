package graft.tools

import graft.engine.GraftSession
import graft.queries.Catalog

/** A/B probe behind `Catalog.staticPlanned`: times every query with AQE on
  * vs off and prints both, so static-planning membership is measured, not
  * guessed.
  *
  * Two traps this harness explicitly avoids (both bit earlier rounds):
  *  - `Catalog.queries` SETS the session's AQE conf during query build (the
  *    per-query planning route). The probe must flip the conf AFTER build,
  *    before the first action — the executed plan is decided lazily — or
  *    both columns silently measure the wrapper's choice.
  *  - measuring all-ON then all-OFF biases the second column fast (more C2
  *    JIT warm-up by then); the two modes are interleaved per repetition.
  *
  * Queries whose CONSTRUCTION already executes jobs under the build conf
  * (x20's df collect, x51/x76's block stats, x62/x72's checkpoints — the
  * checkpoint must capture a concrete partitioning, which AQE hides) can't
  * be cleanly A/B'd here; they are probed as-built, and the flip applies
  * only to the remaining execution.
  */
object AqeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-aqeprobe")
    val names = if (args.nonEmpty) args.toSeq
      else Catalog.benchNames ++ Catalog.benchNamesExtended
    def run(name: String, aqe: String): Double = {
      val df = Catalog.queries(name)(spark, sfDir) // wrapper sets build conf
      spark.conf.set("spark.sql.adaptive.enabled", aqe) // flip for EXECUTION
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (n <- names) {
      run(n, "true"); run(n, "false") // warm both code paths
      val onTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
      val offTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to 5).foreach { _ =>
        onTimes += run(n, "true")
        offTimes += run(n, "false")
      }
      val (on, off) = (onTimes.min, offTimes.min)
      println(f"AQEPROBE $n%-26s aqe_on=$on%.3f aqe_off=$off%.3f delta=${on - off}%+.3f")
    }
    spark.stop()
  }
}
