package graft
import java.nio.file.{Files, Paths}

import graft.engine.GraftSession

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * The session comes from [[GraftSession]] — the engine's actual posture
  * (extensions, UTC, AQE, nanosAsLong, SPARK_GRAFT_CONF overrides). A
  * hand-rolled builder here had already drifted (no GraftExtensions, no
  * conf overrides while `Catalog.aqeOverridden` assumed they were applied,
  * different shuffle-partition default): the plans being VERIFIED must be
  * the plans the engine actually runs.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query names (local iteration aid;
    // the driver always runs the full set)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val spark = GraftSession.getOrCreate("graft-verify")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // remove any previous run's dump AND this run's partial write:
        // a stale directory would make the oracle gate validate round-N
        // results for a round-N+1 regression — a false green
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(): Unit
        }
        rm(new java.io.File(s"$outDir/$name"))
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // sketch-query tolerance magnitudes (VERDICT r11 directive 6): the
    // pass/fail verdicts are hashed inside x28/x54's own outputs; this
    // sidecar records the measured errors behind them
    // NonFatal only (ADVICE r12): an OOM/linkage error here must kill
    // verify, not let it report healthy with a missing sidecar
    try Files.writeString(Paths.get(s"$outDir/tolerance.json"),
      graft.queries.Catalog.toleranceReport(spark, sfDir))
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[verify] tolerance report failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
