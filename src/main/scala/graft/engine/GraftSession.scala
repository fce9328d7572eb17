package graft.engine

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Encodes the execution posture derived from the reference's architecture
  * (see SURVEY.md §4): UTC session time (deterministic date truncation, the
  * reference pins dates as `YYYY-MM-DD` strings — dags/rocket_launch_etl.py:30-31),
  * dynamic partition overwrite (idempotent per-interval re-runs, the semantic
  * fix for the reference's append-on-rerun at dags/rocket_launch_etl.py:105-111),
  * and AQE on (runtime shuffle coalescing / skew-join handling for the 100 TB
  * posture).
  *
  * Shuffle partitions default to the local core count, not Spark's default 200:
  * on a real cluster this would instead be sized to ~2-3× total executor cores
  * or left to AQE's coalescing with a high initial value.
  */
object GraftSession {

  def cpus: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

  /** Apply graft's standard configs to an arbitrary builder. */
  def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      // testdata events.ts is parquet TIMESTAMP(NANOS) — unsupported natively;
      // read as raw nanos and convert in Tables.events (ns→µs truncation,
      // matching DuckDB's read of the same file).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Local session sized from SPARK_GRAFT_CPUS (driver contract). */
  def getOrCreate(appName: String = "graft"): SparkSession = {
    val n = cpus
    val spark = configure(
      SparkSession.builder().master(s"local[$n]").appName(appName), n
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
