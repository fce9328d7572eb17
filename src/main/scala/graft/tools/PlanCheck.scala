package graft.tools
import graft.engine.GraftSession
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.getOrCreate("graft-plancheck")
    args.foreach { n =>
      println(s"===== $n")
      graft.queries.Catalog.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
