package graft.tools
import org.apache.spark.sql.functions._
import graft.engine.GraftSession
object CountOut {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("countout")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (n <- args) {
      val t0 = System.nanoTime()
      val c = graft.queries.Catalog.queries(n)(spark, dir).count()
      println(f"[count] $n: $c rows (${(System.nanoTime()-t0)/1e9}%.1f s)")
    }
    spark.stop()
  }
}
