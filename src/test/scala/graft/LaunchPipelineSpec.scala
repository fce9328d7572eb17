package graft

import java.nio.file.Files
import java.time.LocalDate

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{LaunchPipeline => LP}

/** Golden-oracle port of the reference's correctness mechanism (SURVEY.md §5):
  * fixture A1 (FIXTURES.md) through the full pipeline must reproduce the
  * expected `launch_events` rows and the daily-count query result.
  */
class LaunchPipelineSpec extends AnyFunSuite {
  import SparkTestSession.spark

  val day: LocalDate = LocalDate.parse("2024-12-01")

  /** FIXTURES.md A1: 2 launches, one with a null image subtree. */
  val fixtureA1: String =
    """{"count": 2, "next": null, "previous": null, "results": [
      | {"id": "a1b2", "url": "https://x/1", "name": "Falcon 9 | Demo",
      |  "status": {"name": "Launch Successful", "abbrev": "Success"},
      |  "image": {"image_url": "https://img/1.png", "license": {"name": "CC BY 4.0"}},
      |  "net": "2024-12-01T13:05:00Z", "last_updated": "2024-12-01T14:00:00Z"},
      | {"id": "c3d4", "url": "https://x/2", "name": "Soyuz | Resupply",
      |  "status": {"name": "Go for Launch", "abbrev": "Go"},
      |  "image": null,
      |  "net": "2024-12-01T22:45:00Z", "last_updated": "2024-12-01T23:00:00Z"}
      |]}""".stripMargin.replaceAll("\n", " ")

  def freshZones(): LP.Zones =
    LP.Zones(Files.createTempDirectory("graft_lp").toString)

  test("raw landing is at-most-once (C5 semantics)") {
    val z = freshZones()
    assert(LP.putRaw(z, day, fixtureA1))
    assert(!LP.putRaw(z, day, """{"count":0,"results":[]}"""))
    // first write wins — byte-identical to the landed body
    assert(Files.readString(java.nio.file.Paths.get(z.raw(day))) == fixtureA1)
  }

  test("transform reproduces the golden rows incl. null propagation (C10-C12)") {
    val z = freshZones()
    LP.putRaw(z, day, fixtureA1)
    val got = LP.launchEvents(LP.readRaw(spark, z, day))
      .orderBy("id").collect().toSeq
    val d = java.sql.Date.valueOf("2024-12-01")
    assert(got == Seq(
      Row("a1b2", "https://x/1", "Falcon 9 | Demo", "Launch Successful",
        "https://img/1.png", "CC BY 4.0", d),
      Row("c3d4", "https://x/2", "Soyuz | Resupply", "Go for Launch",
        null, null, d)))
  }

  test("empty results → zero-row partition, no failure") {
    val z = freshZones()
    LP.putRaw(z, day, """{"count": 0, "next": null, "previous": null, "results": []}""")
    assert(LP.launchEvents(LP.readRaw(spark, z, day)).count() == 0)
  }

  test("re-run is idempotent: dynamic partition overwrite replaces, not appends (C6 fix)") {
    val z = freshZones()
    LP.putRaw(z, day, fixtureA1)
    LP.transform(spark, z, day)
    LP.transform(spark, z, day) // the reference would duplicate rows here
    val processed = spark.read.parquet(z.processed)
    assert(processed.count() == 2)
    assert(processed.where(col("net") === "2024-12-01").count() == 2)
  }

  test("publish + catalog + daily-count query reproduce QRY golden result (C7-C9, C13)") {
    val z = freshZones()
    val table = s"launch_events_test_${math.abs(z.base.hashCode)}"
    LP.putRaw(z, day, fixtureA1)
    LP.transform(spark, z, day)
    LP.publish(spark, z, day)
    LP.registerTable(spark, z, table)
    val got = LP.dailyCounts(spark, table).collect().toSeq
    assert(got == Seq(Row(java.sql.Date.valueOf("2024-12-01"), 2L)))
    spark.sql(s"DROP TABLE $table")
  }

  test("hardened run registers serving table, validates schema; salted " +
    "daily count is exact (opt-in 100TB hardening on the pipeline path)") {
    val z = freshZones()
    val fetch: LP.PageFetcher = (_, _, _) => fixtureA1
    // validateSchema implies registration; a clean run must pass the gate
    LP.run(spark, z, day, fetch, LP.RunHardening(validateSchema = true))
    assert(spark.catalog.tableExists("launch_events"))
    val plain = LP.dailyCounts(spark).collect().toSeq
    val salted = LP.dailyCounts(spark, salted = true).collect().toSeq
    assert(plain == Seq(Row(java.sql.Date.valueOf("2024-12-01"), 2L)))
    assert(salted == plain) // salting changes the plan, never the answer
    spark.sql("DROP TABLE launch_events")
  }

  test("runRange backfills independent days and re-runs idempotently") {
    val z = freshZones()
    def bodyFor(d: LocalDate): String =
      fixtureA1.replaceAll("2024-12-01", d.toString)
    val fetch: LP.PageFetcher = (start, _, _) => bodyFor(start)
    val start = day
    val end = day.plusDays(3)
    val ran = LP.runRange(spark, z, start, end, fetch)
    assert(ran == Seq(day, day.plusDays(1), day.plusDays(2)))
    val processed = spark.read.parquet(z.processed)
    assert(processed.count() == 6) // 2 rows × 3 days
    assert(processed.select("net").distinct().count() == 3)
    // re-running the same range neither duplicates rows nor re-lands raw
    LP.runRange(spark, z, start, end, fetch)
    assert(spark.read.parquet(z.processed).count() == 6)
    assert(spark.read.parquet(z.reports).count() == 6)
    // empty range is a no-op, inverted range fails loudly
    assert(LP.runRange(spark, z, start, start, fetch).isEmpty)
    intercept[IllegalArgumentException] {
      LP.runRange(spark, z, end, start, fetch)
    }
  }

  test("zones accept any Hadoop FS URI: pipeline runs on a custom scheme") {
    // a scheme that resolves to RawLocalFileSystem proves the pathing goes
    // through the Hadoop FS layer (the s3a:// seam) without needing live S3
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    val dir = Files.createTempDirectory("graft_lp_uri").toString
    val z = LP.Zones(s"graftfs://$dir")
    assert(LP.putRaw(z, day, fixtureA1, hc))
    assert(!LP.putRaw(z, day, """{"count":0,"results":[]}""", hc)) // at-most-once
    // the bytes really landed on the backing store
    assert(Files.readString(java.nio.file.Paths.get(s"$dir/raw/launch/$day.json"))
      == fixtureA1)
    LP.transform(spark, z, day)
    LP.publish(spark, z, day)
    assert(spark.read.parquet(z.reports).count() == 2)
  }

  test("serving-schema drift is detected (C8 gap the reference leaves open)") {
    val z = freshZones()
    val table = s"launch_events_drift_${math.abs(z.base.hashCode)}"
    LP.putRaw(z, day, fixtureA1)
    LP.transform(spark, z, day)
    LP.publish(spark, z, day)
    LP.registerTable(spark, z, table)
    LP.validateServingSchema(spark, z, table) // in-sync: passes
    // a drifted catalog declaration over the SAME files must fail loudly
    val drifted = s"${table}_v2"
    spark.sql(
      s"""CREATE TABLE $drifted
         |  (id STRING, url STRING, name STRING, status STRING,
         |   image_url STRING, license STRING, extra_col INT, net DATE)
         |USING PARQUET PARTITIONED BY (net)
         |LOCATION '${z.reports}'""".stripMargin)
    val e = intercept[IllegalStateException] {
      LP.validateServingSchema(spark, z, drifted)
    }
    assert(e.getMessage.contains("extra_col"))
    spark.sql(s"DROP TABLE $table")
    spark.sql(s"DROP TABLE $drifted")
  }

  test("ingest follows pagination; reference would drop page 2 (C1 fix)") {
    val page1 =
      """{"count": 2, "next": "https://api/launches/?offset=1", "previous": null,
        | "results": [{"id": "p1", "url": "u1", "name": "n1",
        |   "status": {"name": "s", "abbrev": "s"}, "image": null,
        |   "net": "2024-12-01T01:00:00Z", "last_updated": "x"}]}"""
        .stripMargin.replaceAll("\n", " ")
    val page2 = page1.replace(""""next": "https://api/launches/?offset=1"""", """"next": null""")
      .replace("p1", "p2")
    val z = freshZones()
    var calls = 0
    val fetch: LP.PageFetcher = (_, _, offset) => {
      calls += 1
      if (offset == 0) page1 else page2
    }
    assert(LP.ingest(z, day, fetch))
    assert(calls == 2)
    val rows = LP.launchEvents(LP.readRaw(spark, z, day))
    assert(rows.select("id").orderBy("id").collect().map(_.getString(0)).toSeq
      == Seq("p1", "p2"))
  }
}
