package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Catalog
import graft.sources.Tables

/** SQL-surface parity (SURVEY.md §5 t1): the core queries are expressible as
  * pure `spark.sql` over registered views and agree with the DataFrame-API
  * programs in Catalog. Also exercises the typed Dataset boundary. */
class SqlSurfaceSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf0001}

  /** Spark SQL texts for a representative core subset (these differ from the
    * DuckDB oracle texts only where dialects diverge). */
  val sparkSql: Map[String, String] = Map(
    "q01_project_rename" ->
      """SELECT l_orderkey AS okey, l_partkey AS pkey, l_returnflag AS rflag
        |FROM lineitem ORDER BY l_orderkey, l_partkey, l_linenumber""".stripMargin,
    "q02_cast_date" ->
      "SELECT event_id, CAST(ts AS DATE) AS d FROM events ORDER BY event_id",
    "q05_daily_distinct" ->
      """SELECT CAST(ts AS DATE) AS d, COUNT(DISTINCT user_id) AS event_count
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q07_group_count" ->
      "SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1 ORDER BY 1",
    "q09_join_agg" ->
      """SELECT c_mktsegment,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q10_anti_join" ->
      """SELECT c_custkey FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin,
    "q15_set_except" ->
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |EXCEPT
        |SELECT user_id FROM events WHERE event_type = 'error'
        |ORDER BY user_id""".stripMargin,
    "q16_join_window" ->
      """SELECT n_name, rn, c_custkey, c_acctbal FROM (
        |  SELECT n.n_name, c.c_custkey, c.c_acctbal, row_number() OVER (
        |    PARTITION BY n.n_name ORDER BY c.c_acctbal DESC, c.c_custkey) AS rn
        |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey) t
        |WHERE rn <= 2 ORDER BY n_name, rn""".stripMargin,
    "x31_rollup_agg" ->
      """SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n
        |FROM events GROUP BY ROLLUP(event_type, CAST(ts AS DATE))
        |ORDER BY event_type ASC NULLS FIRST, d ASC NULLS FIRST""".stripMargin,
    "x37_cube_agg" ->
      """SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n
        |FROM events GROUP BY CUBE(event_type, CAST(ts AS DATE))
        |ORDER BY event_type ASC NULLS FIRST, d ASC NULLS FIRST""".stripMargin,
    "x42_pivot" ->
      """SELECT d, coalesce(click, 0) AS click, coalesce(error, 0) AS error,
        |  coalesce(purchase, 0) AS purchase, coalesce(signup, 0) AS signup,
        |  coalesce(view, 0) AS view
        |FROM (SELECT CAST(ts AS DATE) AS d, event_type FROM events)
        |PIVOT (COUNT(*) FOR event_type
        |       IN ('click', 'error', 'purchase', 'signup', 'view'))
        |ORDER BY d""".stripMargin,
    "x36_window_lag" ->
      """SELECT user_id, event_id,
        |  unix_micros(ts) - lag(unix_micros(ts)) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    // the whole x89 winnowing dedup as pure SQL over the registered kernel
    "x89_winnowing" ->
      """SELECT doc_id, COUNT(*) AS n_fp,
        |  CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_fp,
        |  CAST(CASE WHEN SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) * 5
        |      >= COUNT(*) * 4 THEN 1 ELSE 0 END AS BIGINT) AS near_dup
        |FROM (SELECT doc_id, fp, row_number() OVER (
        |    PARTITION BY fp ORDER BY doc_id) AS rn
        |  FROM (SELECT doc_id, explode(graft_winnow_set(text, 4, 5)) AS fp
        |        FROM documents))
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // the bounded top-k aggregate's SQL face (graft_largest_k): x101 as
    // pure spark.sql — same heap, same (quality DESC, doc_id ASC) order
    // via the -doc_id inversion, posexplode as the rank
    "x101_topk_exemplars" ->
      """WITH c AS (SELECT doc_id, source,
        |    CAST(element_at(graft_lang_stats(text), 5) AS INT) AS n_tokens,
        |    CAST(element_at(graft_lang_stats(text), 1) AS INT) AS en_hits
        |  FROM documents),
        |q AS (SELECT source, doc_id,
        |    round(1.0 / (1.0 + exp(-(0.2 * ln(1.0 + n_tokens) +
        |      2.0 * (en_hits / (1.0 * n_tokens)) - 1.0))), 4) AS quality
        |  FROM c WHERE n_tokens > 0),
        |t AS (SELECT source,
        |    graft_largest_k(struct(quality, -doc_id AS nid, doc_id), 3)
        |      AS top
        |  FROM q GROUP BY source)
        |SELECT source, CAST(pos + 1 AS INT) AS rk,
        |  col.doc_id AS doc_id, col.quality AS quality
        |FROM t LATERAL VIEW posexplode(top) AS pos, col
        |ORDER BY source, rk""".stripMargin)

  for ((name, sql) <- sparkSql.toSeq.sortBy(_._1)) {
    test(s"$name: spark.sql ≡ DataFrame API") {
      Tables.registerAll(spark, sf0001)
      val viaSql = spark.sql(sql)
      val viaApi = Catalog.queries(name)(spark, sf0001)
      assert(viaSql.columns.toSeq == viaApi.columns.toSeq)
      assert(viaSql.except(viaApi).count() == 0)
      assert(viaApi.except(viaSql).count() == 0)
    }
  }

  test("typed Dataset boundary: launchEventsDs round-trips the golden fixture") {
    import graft.pipeline.{Ll2, LaunchPipeline => LP}
    import SparkTestSession.spark.implicits._
    val body =
      """{"count":1,"next":null,"previous":null,"results":[
        |{"id":"t1","url":"u","name":"n","status":{"name":"Go","abbrev":"G"},
        |"image":null,"net":"2024-12-01T13:05:00Z","last_updated":"x"}]}"""
        .stripMargin.replaceAll("\n", "")
    val raw = spark.read.schema(Ll2.schema).json(Seq(body).toDS())
    val ds = LP.launchEventsDs(raw)
    val e = ds.collect().head
    assert(e.id == "t1" && e.status == "Go" && e.image_url == null)
    assert(e.net == java.sql.Date.valueOf("2024-12-01"))
    // typed filter compiles and runs on the Dataset
    assert(ds.filter(_.net != null).count() == 1)
  }

  test("graft_smallest_k/largest_k reject wrong arity with a styled " +
    "message, not an analyzer IndexOutOfBounds") {
    Tables.registerAll(spark, SparkTestSession.sf0001)
    for ((fn, bad) <- Seq(
        "graft_smallest_k" -> "SELECT graft_smallest_k() FROM documents",
        "graft_largest_k" ->
          "SELECT graft_largest_k(doc_id) FROM documents",
        "graft_smallest_k" ->
          "SELECT graft_smallest_k(doc_id, 2, 3) FROM documents")) {
      val e = intercept[Exception](spark.sql(bad).collect())
      // the arity guard's message, surfaced through the analyzer wrapper
      assert(e.getMessage.contains(s"$fn: expected 2 arguments"),
        s"got: ${e.getMessage.take(200)}")
    }
  }
}
