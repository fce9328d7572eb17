package graft.pipeline

import org.apache.spark.sql.types._

/** Pinned schema for the Launch Library 2 `mode=list` payload, the raw-zone
  * document shape landed verbatim by the reference
  * (dags/rocket_launch_etl.py:48,57; field consumption at :84-99).
  *
  * The reference infers this shape at runtime with pandas (`pd.read_json` +
  * `json_normalize`), so a missing nested field is a KeyError there. We pin an
  * explicit StructType instead: deterministic reads, and missing nested fields
  * become NULLs (`GetStructField` null propagation) — a documented semantic
  * upgrade (SURVEY.md §1.3). Only the fields the transform consumes are
  * contractual; extra payload fields are simply absent from this schema and
  * never read (nested-schema pruning keeps them out of the parquet/JSON scan).
  */
object Ll2 {

  val license: StructType = StructType(Seq(
    StructField("name", StringType)))

  val image: StructType = StructType(Seq(
    StructField("image_url", StringType),
    StructField("license", license)))

  val status: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("abbrev", StringType)))

  val result: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("url", StringType),
    StructField("name", StringType),
    StructField("status", status),
    StructField("image", image),
    StructField("net", StringType),          // ISO-8601 timestamp, cast later
    StructField("last_updated", StringType)))

  /** Envelope: `{count, next, previous, results: [...]}`. */
  val schema: StructType = StructType(Seq(
    StructField("count", LongType),
    StructField("next", StringType),
    StructField("previous", StringType),
    StructField("results", ArrayType(result))))
}
