package graft

import java.time.LocalDate

import org.apache.spark.sql.SparkSession

import graft.pipeline.{LaunchPipeline => LP}

/** Cross-process catalog persistence: the reference serves its table through
  * a REAL Hive metastore (hive/conf/metastore-site.xml; Trino resolves
  * `hive.default.launch_events` via thrift), so registration must outlive the
  * session that created it. The in-memory session catalog used by default is
  * fine for one session but is a gap for multi-session serving — this main
  * proves the engine closes it with Spark's built-in Hive catalog over an
  * embedded Derby metastore (config, not code: `catalogImplementation=hive`).
  *
  * Two phases in two separate JVMs (Derby's embedded lock is released at
  * process exit, mirroring metastore-backed engines restarting):
  *   phase1 <base>: run the pipeline, register the external table + recover
  *     partitions in the metastore, verify the serving query.
  *   phase2 <base>: a FRESH process resolves the same table purely from the
  *     metastore (no re-registration) and re-runs the serving query.
  * [[graft.HiveCatalogSpec]] forks both phases and asserts the markers.
  */
object HiveCatalogDemo {

  private val fixture: String =
    """{"count": 2, "next": null, "previous": null, "results": [
      | {"id": "h1", "url": "https://x/1", "name": "Falcon 9 | Demo",
      |  "status": {"name": "Launch Successful", "abbrev": "Success"},
      |  "image": {"image_url": "https://img/1.png", "license": {"name": "CC"}},
      |  "net": "2024-12-01T13:05:00Z", "last_updated": "x"},
      | {"id": "h2", "url": "https://x/2", "name": "Soyuz | Resupply",
      |  "status": {"name": "Go for Launch", "abbrev": "Go"},
      |  "image": null,
      |  "net": "2024-12-01T22:45:00Z", "last_updated": "x"}
      |]}""".stripMargin.replaceAll("\n", " ")

  private def session(base: String): SparkSession =
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-hive-catalog")
      .config("spark.sql.catalogImplementation", "hive")
      .config("spark.sql.warehouse.dir", s"$base/warehouse")
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$base/metastore_db;create=true")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  def main(args: Array[String]): Unit = {
    val Array(phase, base) = args
    val day = LocalDate.parse("2024-12-01")
    val spark = session(base)
    spark.sparkContext.setLogLevel("WARN")
    val table = "launch_events_hive"
    phase match {
      case "phase1" =>
        val zones = LP.Zones(s"$base/lake")
        LP.run(spark, zones, day, (_, _, _) => fixture)
        LP.registerTable(spark, zones, table)
        val got = LP.dailyCounts(spark, table).collect()
        require(got.length == 1 && got(0).getLong(1) == 2L,
          s"phase1 serving query wrong: ${got.mkString(",")}")
        println("HIVE_PHASE1_OK")
      case "phase2" =>
        // no registration here: resolution must come from the metastore
        require(spark.catalog.tableExists(table), s"$table not in metastore")
        val got = LP.dailyCounts(spark, table).collect()
        require(got.length == 1 && got(0).getLong(1) == 2L,
          s"phase2 serving query wrong: ${got.mkString(",")}")
        println("HIVE_PHASE2_OK")
    }
    spark.stop()
  }
}
