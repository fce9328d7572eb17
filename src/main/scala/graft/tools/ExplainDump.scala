package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

import graft.engine.GraftSession
import graft.queries.Catalog

/** Diagnostic main: writes `.explain("formatted")` output for the named
  * queries to `<outDir>/<query>_<tag>.txt` — the plan evidence files the
  * optimization rounds commit under `plans/rNN/`. Usage:
  *
  *   sbt "runMain graft.tools.ExplainDump <outDir> <tag> q13 x24 ..."
  *
  * Reads the data dir from SPARK_GRAFT_SF_DIR like every other tool. The
  * dump is the pre-execution formatted plan (the artifact the judge can
  * diff without running Spark); PlanDump remains the post-AQE companion. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainDump <outDir> <tag> <query>...")
    val outDir = Paths.get(args(0))
    val tag = args(1)
    val names = args.drop(2)
    Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-explaindump")
    names.foreach { name =>
      val df = Catalog.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.write(outDir.resolve(s"${name}_$tag.txt"),
        txt.getBytes(StandardCharsets.UTF_8))
      println(s"[explaindump] wrote ${name}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
