package graft.tools
import graft.engine.GraftSession
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("graft-plancheck")
    args.foreach { n =>
      println(s"===== $n")
      graft.queries.Catalog.queries(n)(spark, "/root/testdata/sf0.01")
        .explain("formatted")
    }
    spark.stop()
  }
}
