package graft.tools
import graft.engine.GraftSession
import graft.queries.Catalog
object AqeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-aqeprobe")
    val names = if (args.nonEmpty) args.toSeq
      else Catalog.benchNames ++ Catalog.benchNamesExtended
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      Catalog.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (n <- names) {
      val r = for (aqe <- Seq("true", "false")) yield {
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        run(n)
        (1 to 5).map(_ => run(n)).min
      }
      println(f"AQEPROBE $n%-26s aqe_on=${r(0)}%.3f aqe_off=${r(1)}%.3f delta=${r(0) - r(1)}%+.3f")
    }
    spark.stop()
  }
}
