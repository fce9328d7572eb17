package graft.tools

import graft.engine.GraftSession
import graft.queries.Catalog

/** Diagnostic main: executes the named queries once and prints the FINAL
  * (post-AQE) physical plan, to check exchange/stage reuse and shuffle
  * shapes while tuning the bench set. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-plandump")
    args.foreach { name =>
      val df = Catalog.queries(name)(spark, sfDir)
      df.write.mode("overwrite").format("noop").save()
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.toString.take(12000))
    }
    spark.stop()
  }
}
