package graft

import org.apache.spark.sql.SparkSession

import graft.engine.GraftSession
import graft.queries.Catalog

/** Benchmark main: runs the headline query set against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Protocol (BASELINE.md, symmetric with tools/bench_duckdb.py): warm-session
  * time — each query runs once to warm codegen/file listing, then the
  * reported value is the best of 5 timed runs with a GC between queries (a
  * 37-query session otherwise carries GC debt from one query into the next,
  * which measured as ±40% run-to-run noise on the heavy dedup queries).
  * Best-of-5 rather than best-of-3 because the JVM's C2 JIT needs several
  * executions to reach steady state (x18's heavy job measured 422 ms on its
  * first post-warm-up run and 63 ms by the third — profiled round 3); both
  * engines run the identical rule. Execution is forced through the no-op
  * sink so the full plan runs without collecting results to the driver.
  *
  * Machine-load sentinel: a fixed floor probe (1-task job + one-exchange
  * shuffle job, best-of-5) runs before and after the query set and is
  * published as "floor_pre"/"floor_post". The probe touches no data, so its
  * time is pure scheduling floor — an ambient-loaded session shows up as an
  * elevated or asymmetric sentinel instead of silently skewing every query
  * (the round-4 BENCH published ~1.5× uniform drift with nothing in the
  * file to flag it).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-bench")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      Catalog.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    def benchSet(names: Seq[String]): Seq[(String, Double)] = names.map { name =>
      try {
        System.gc() // don't bill this query for the previous one's garbage
        runOnce(name) // warm-up: codegen + parquet footer/file listing
        name -> (1 to 5).map(_ => runOnce(name)).min
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          name -> -1.0
      }
    }
    // Locale.ROOT: a comma-decimal default locale (de_DE) would print
    // 0,8812 and invalidate the one JSON line the driver parses
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    def json(results: Seq[(String, Double)]): String =
      results.map { case (k, v) => s""""$k":${fmt(v)}""" }
        .mkString("{", ",", "}")
    def total(results: Seq[(String, Double)]): String =
      fmt(results.map(_._2).filter(_ >= 0).sum)

    def floorProbe(): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        spark.sparkContext.parallelize(Seq(1), 1).count()
        spark.range(1000).toDF("v").groupBy(org.apache.spark.sql.functions
          .pmod(org.apache.spark.sql.functions.col("v"),
            org.apache.spark.sql.functions.lit(10L))).count()
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up
      (1 to 5).map(_ => once()).min
    }

    // optional args: query names to bench (local iteration aid; the driver
    // always runs the full set)
    val only = args.toSet
    def pick(names: Seq[String]) = if (only.isEmpty) names else names.filter(only)
    // headline set first ("metric"/"value" keep their round-1 meaning, so
    // totals stay comparable across rounds); extended tier reported beside it
    val floorPre = floorProbe()
    val head = benchSet(pick(Catalog.benchNames))
    val ext = benchSet(pick(Catalog.benchNamesExtended))
    val floorPost = floorProbe()
    // Window-health self-description (VERDICT r8 stretch 7): BASELINE.md's
    // recorded moderate-window floors sit at 0.13-0.19 s; the documented
    // host-degradation bracket (pairs 32-34, rounds 7-8 driver benches) at
    // 0.28-0.35 s. Publishing the classification in the artifact means a
    // drifted round is self-describing instead of needing human sentinel
    // forensics against BASELINE.md after the fact.
    val window =
      if (math.max(floorPre, floorPost) > 0.25) "degraded" else "moderate"
    // shared prefix for the full and compact metric lines (ADVICE r8: two
    // independent string builders had already half-drifted once)
    val prefix =
      s"""{"metric":"total","value":${total(head)},"unit":"sec","queries":${json(head)},""" +
      s""""extended_total":${total(ext)},"""
    val suffix =
      s""""floor_pre":${fmt(floorPre)},"floor_post":${fmt(floorPost)},""" +
      s""""window":"$window","sf":"$sfDir"}"""
    val line = prefix + s""""extended_queries":${json(ext)},""" + suffix
    println(line)
    // the driver greps stdout for the JSON line, but five rounds of
    // BENCH_r0N.json carried "parsed": null — sbt/log4j interleaving can
    // truncate or split the line. A file copy survives any stdout mangling.
    try {
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_metric.json"))
      java.nio.file.Files.write(out,
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[bench] wrote ${out.toAbsolutePath}")
    } catch {
      case e: Exception => // stdout line already printed; the file is a backup
        System.err.println(s"[bench] could not write bench_metric.json: $e")
    }
    spark.stop()
    // Re-print a metric line as the ABSOLUTE last stdout action, after
    // spark.stop(). Seven rounds of BENCH_r0N.json carried "parsed": null;
    // BENCH_r07 finally showed why: the driver keeps only the LAST 2000
    // chars of stdout (its "tail" field is exactly 2000 chars and begins
    // mid-line), and the full 101-query line is ~4.5k chars — the window
    // can never hold it, no matter where it's printed. So the final line is
    // a COMPACT one: head-set per-query detail plus extended/floor
    // aggregates, ~1.3k chars, fitting the window even with sbt's trailing
    // "[success]" line. Full per-query detail (both tiers) stays in the
    // early println above and in bench_metric.json.
    val compact = prefix + s""""extended_n":${ext.size},""" + suffix
    // ADVICE r8: the 2000-char driver stdout window is the hard constraint
    // the compact line exists for; log the length so a future overflow is
    // diagnosable from the bench output instead of reappearing as
    // "parsed": null (~1.3k today; sbt's trailing [success] eats ~100).
    System.err.println(s"[bench] compact line length: ${compact.length}" +
      (if (compact.length > 1800) "  WARNING: exceeds driver tail budget" else ""))
    println(compact)
    System.out.flush()
  }
}
