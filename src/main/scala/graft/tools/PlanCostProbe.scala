package graft.tools

import graft.engine.GraftSession
import graft.queries.Catalog

/** Splits a query's warm per-run cost into PLANNING (build the DataFrame +
  * analyze/optimize/plan, i.e. `queryExecution.executedPlan`) vs EXECUTION
  * (the noop write given a pre-built frame). The bench protocol rebuilds
  * the frame each run on both engines (DuckDB re-parses its SQL each run),
  * so planning is a legitimate — and for floor-class queries possibly
  * dominant — component of the measured gap.
  *
  * CAVEAT for checkpoint-carrying queries (x83/x84/x100 …): the pre-built
  * frame's lazy localCheckpoints materialize during exec's warm call and
  * are REUSED on every timed exec run, so exec_s understates steady-state
  * execution and plan_s + exec_s will not reconcile with full_s (which
  * rebuilds, hence re-checkpoints, each run). full_s is the bench-faithful
  * number; the split is only valid when the three roughly reconcile — a
  * "(split<full: ckpt reuse?)" marker is printed when they don't. */
object PlanCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-plancost")
    def bo5(f: () => Unit): Double = {
      f() // warm
      (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }.min
    }
    println(f"${"query"}%-28s plan_s  exec_s  full_s")
    for (name <- args) {
      val plan = bo5(() =>
        Catalog.queries(name)(spark, sfDir).queryExecution.executedPlan: Unit)
      val df = Catalog.queries(name)(spark, sfDir)
      val exec = bo5(() =>
        df.write.mode("overwrite").format("noop").save())
      val full = bo5(() => Catalog.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save())
      val marker =
        if (full > (plan + exec) * 1.25 && full - (plan + exec) > 0.05)
          "  (split<full: ckpt reuse?)"
        else ""
      println(f"$name%-28s $plan%6.3f  $exec%6.3f  $full%6.3f$marker")
    }
    spark.stop()
  }
}
