package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.http.{FakeTransport, HttpStatusException, RetryingTransport, Transport}

/** The DSv2 HTTP source: filter pushdown to query params, one partition per
  * page, nested-null flattening. */
class HttpLaunchSourceSpec extends AnyFunSuite {
  import SparkTestSession.spark

  val base = "https://ll.example/2.3.0/launches/"
  val fmt = "graft.sources.http.HttpLaunchSource"

  def launch(id: String, net: String): String =
    s"""{"id": "$id", "url": "https://x/$id", "name": "L$id",
       | "status": {"name": "Go", "abbrev": "G"},
       | "image": null, "net": "$net", "last_updated": "x"}""".stripMargin

  def page(count: Int, results: Seq[String], next: Option[String]): String =
    s"""{"count": $count, "next": ${next.map("\"" + _ + "\"").orNull},
       | "previous": null, "results": [${results.mkString(",")}]}""".stripMargin

  test("pushes net range into the URL and reads all pages in parallel partitions") {
    FakeTransport.reset()
    val range = "net__gte=2024-12-01T00:00:00Z&net__lt=2024-12-02T00:00:00Z"
    val p0 = s"$base?mode=list&limit=2&offset=0&$range"
    val p1 = s"$base?mode=list&limit=2&offset=2&$range"
    FakeTransport.register(p0, page(3,
      Seq(launch("a", "2024-12-01T01:00:00Z"), launch("b", "2024-12-01T02:00:00Z")),
      Some(p1)))
    FakeTransport.register(p1, page(3,
      Seq(launch("c", "2024-12-01T03:00:00Z")), None))

    val df = spark.read.format(fmt)
      .option("url", base).option("pageSize", "2").option("transport", "fake")
      .load()
      .where(col("net") >= lit(java.sql.Timestamp.valueOf("2024-12-01 00:00:00")) &&
        col("net") < lit(java.sql.Timestamp.valueOf("2024-12-02 00:00:00")))

    val rows = df.orderBy("id").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    assert(rows(0).getString(3) == "Go")
    assert(rows(0).isNullAt(4) && rows(0).isNullAt(5)) // null image subtree

    // pushdown reached the wire: every request carried the range params
    val reqs = FakeTransport.requested.toArray(Array.empty[String])
    assert(reqs.nonEmpty && reqs.forall(_.contains(range)))
    // pagination: both pages were fetched
    assert(reqs.toSet == Set(p0, p1))
    // and the plan shows the pushed filters
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("net__gte") ||
      plan.contains("PushedFilters") || plan.contains("LaunchScan"))
  }

  test("maxPartitions groups pages into concurrent-fetch runs: same rows, " +
    "same per-page URLs, bounded task count") {
    FakeTransport.reset()
    // 7 pages of 2 rows under a 3-partition cap → runs of 2/2/3 pages,
    // each fetched through the reader's bounded pool
    val n = 13
    val ids = (0 until n).map(i => f"d$i%02d")
    val urls = (0 until 7).map(p => s"$base?mode=list&limit=2&offset=${p * 2}")
    for (p <- 0 until 7) {
      val slice = ids.slice(p * 2, p * 2 + 2)
        .map(id => launch(id, "2024-12-01T01:00:00Z"))
      FakeTransport.register(urls(p), page(n, slice,
        if (p < 6) Some(urls(p + 1)) else None))
    }
    val df = spark.read.format(fmt)
      .option("url", base).option("pageSize", "2").option("transport", "fake")
      .option("maxPartitions", "3").option("fetchConcurrency", "3")
      .load()
    // ONE action: rows + the partition they came from
    val got = df.select(col("id"), spark_partition_id().as("pid")).collect()
    assert(got.map(_.getString(0)).sorted.toSeq == ids)
    assert(got.map(_.getInt(1)).distinct.sorted.toSeq == Seq(0, 1, 2))
    // pages 1..6 fetched EXACTLY once each (readers do no duplicate work);
    // page 0's URL may appear more than once — the planner probes it per
    // (re)planning, but the probe body rides the partition so the READER
    // never re-downloads it
    val reqs = FakeTransport.requested.toArray(Array.empty[String])
    assert(reqs.filterNot(_.endsWith("offset=0")).sorted.toSeq ==
      urls.tail.sorted.toSeq)
    assert(reqs.toSet == urls.toSet)
    // a mid-run page failure surfaces the page's own exception
    FakeTransport.reset()
    for (p <- Seq(0, 1, 3, 4, 5, 6)) { // page 2 missing
      val slice = ids.slice(p * 2, p * 2 + 2)
        .map(id => launch(id, "2024-12-01T01:00:00Z"))
      FakeTransport.register(urls(p), page(n, slice, None))
    }
    val failing = spark.read.format(fmt)
      .option("url", base).option("pageSize", "2").option("transport", "fake")
      .option("maxPartitions", "2").load()
    val e = intercept[org.apache.spark.SparkException](failing.count())
    assert(e.getMessage.contains("no fixture") ||
      Option(e.getCause).exists(_.getMessage.contains("no fixture")))
  }

  test("duplicate net conjuncts fold to the TIGHTEST bound, not the last one") {
    FakeTransport.reset()
    // Accepted pushed filters are never re-applied post-scan (DSv2 contract),
    // so if the looser of two >= bounds won the overwrite, out-of-range rows
    // would silently flow through. Only the tightest-interval URL is
    // registered: a widened interval fails loudly as a missing fixture.
    val range = "net__gte=2024-12-01T00:00:00Z&net__lt=2024-12-02T00:00:00Z"
    val p0 = s"$base?mode=list&limit=100&offset=0&$range"
    FakeTransport.register(p0, page(1,
      Seq(launch("a", "2024-12-01T01:00:00Z")), None))
    val df = spark.read.format(fmt)
      .option("url", base).option("transport", "fake").load()
      .where(col("net") >= lit(java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))
      .where(col("net") >= lit(java.sql.Timestamp.valueOf("2024-12-01 00:00:00")))
      .where(col("net") < lit(java.sql.Timestamp.valueOf("2025-01-01 00:00:00")))
      .where(col("net") < lit(java.sql.Timestamp.valueOf("2024-12-02 00:00:00")))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("a"))
    val reqs = FakeTransport.requested.toArray(Array.empty[String])
    assert(reqs.nonEmpty && reqs.forall(_.contains(range)))
  }

  test("unsupported predicates remain as post-scan filters, results stay correct") {
    FakeTransport.reset()
    val p0 = s"$base?mode=list&limit=100&offset=0"
    FakeTransport.register(p0, page(2,
      Seq(launch("a", "2024-12-01T01:00:00Z"), launch("b", "2024-12-01T02:00:00Z")),
      None))
    val df = spark.read.format(fmt)
      .option("url", base).option("transport", "fake").load()
      .where(col("name") === "La") // not pushable → residual filter
    assert(df.collect().map(_.getString(0)).toSeq == Seq("a"))
  }

  test("empty interval yields an empty frame, not a failure") {
    FakeTransport.reset()
    FakeTransport.register(s"$base?mode=list&limit=100&offset=0",
      page(0, Seq.empty, None))
    val df = spark.read.format(fmt)
      .option("url", base).option("transport", "fake").load()
    assert(df.count() == 0)
  }

  test("column pruning reaches the scan: only projected fields are read") {
    FakeTransport.reset()
    val p0 = s"$base?mode=list&limit=100&offset=0"
    FakeTransport.register(p0, page(2,
      Seq(launch("a", "2024-12-01T01:00:00Z"), launch("b", "2024-12-01T02:00:00Z")),
      None))
    val df = spark.read.format(fmt)
      .option("url", base).option("transport", "fake").load()
      .select("id", "status")
    assert(df.collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("a", "Go"), ("b", "Go")))
    // the scan itself carries the pruned schema, not all 7 columns
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=[id,status]"), s"pruned cols not in scan:\n$plan")
    assert(!plan.contains("cols=[id,url,name,status,image_url,license,net]"))
  }

  test("limit pushdown plans only the pages the limit needs") {
    FakeTransport.reset()
    val p0 = s"$base?mode=list&limit=2&offset=0"
    val p1 = s"$base?mode=list&limit=2&offset=2"
    val p2 = s"$base?mode=list&limit=2&offset=4"
    FakeTransport.register(p0, page(6,
      Seq(launch("a", "2024-12-01T01:00:00Z"), launch("b", "2024-12-01T02:00:00Z")),
      Some(p1)))
    FakeTransport.register(p1, page(6,
      Seq(launch("c", "2024-12-01T03:00:00Z"), launch("d", "2024-12-01T04:00:00Z")),
      Some(p2)))
    FakeTransport.register(p2, page(6,
      Seq(launch("e", "2024-12-01T05:00:00Z"), launch("f", "2024-12-01T06:00:00Z")),
      None))
    val df = spark.read.format(fmt)
      .option("url", base).option("pageSize", "2").option("transport", "fake")
      .load().limit(3)
    assert(df.collect().length == 3)
    val reqs = FakeTransport.requested.toArray(Array.empty[String]).toSet
    // pages 0 and 1 cover limit=3; page 2 must never be fetched
    assert(!reqs.contains(p2), s"limit pushdown fetched page 2: $reqs")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("limit=3"), s"pushed limit not in scan:\n$plan")
  }

  test("retrying transport survives transient failures with backoff") {
    var calls = 0
    val flaky = new Transport {
      override def get(url: String): String = {
        calls += 1
        if (calls <= 2) throw new HttpStatusException(503, url)
        "ok"
      }
    }
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val t = RetryingTransport(flaky, maxAttempts = 3, initialBackoffMs = 100,
      sleep = sleeps += _)
    assert(t.get("u") == "ok")
    assert(calls == 3)
    assert(sleeps.toSeq == Seq(100L, 200L)) // exponential backoff
  }

  test("retrying transport gives up after maxAttempts and skips permanent 4xx") {
    var calls = 0
    val alwaysDown = new Transport {
      override def get(url: String): String = {
        calls += 1; throw new HttpStatusException(500, url)
      }
    }
    val t = RetryingTransport(alwaysDown, maxAttempts = 3, sleep = _ => ())
    intercept[HttpStatusException] { t.get("u") }
    assert(calls == 3)

    var calls4 = 0
    val notFound = new Transport {
      override def get(url: String): String = {
        calls4 += 1; throw new HttpStatusException(404, url)
      }
    }
    val t4 = RetryingTransport(notFound, maxAttempts = 3, sleep = _ => ())
    intercept[HttpStatusException] { t4.get("u") }
    assert(calls4 == 1) // permanent failure: no retry
  }
}
