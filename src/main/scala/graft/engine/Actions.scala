package graft.engine

import org.apache.spark.sql.{DataFrame, Row}

/** Driver-side actions tuned for job count.
  *
  * `df.limit(cap + 1).collect()` plans a CollectLimit, which executes
  * INCREMENTALLY: one partition first, then 4×, 16×, … more per round until
  * the limit is satisfied or the input is exhausted (spark.sql.limit
  * .scaleUpFactor). For a bounded-probe pattern — "give me everything, but
  * fail loudly past a cap" — the limit is sized to NEVER be reached, so the
  * scale-up walks every partition across ~log₄(parts) separate jobs, each
  * paying the full per-job scheduling floor (measured ~3 extra jobs ≈
  * 0.15-0.3 s on x20/x21 at sf0.1).
  */
object Actions {

  /** Collect up to `cap` rows in exactly ONE job, or None when the input
    * has more. Per-partition `take(cap + 1)` bounds what any executor sends
    * (same posture as Spark's own broadcast-exchange collect: the failure
    * mode for oversized input is a loud abort, not an unbounded pull).
    *
    * Exactness: if the result has ≤ cap rows, no partition was truncated —
    * a partition only truncates when it holds > cap + 1 rows, which alone
    * already pushes the total past the cap and returns None. */
  def boundedRows(df: DataFrame, cap: Int): Option[Array[Row]] = {
    val rows = df.rdd.mapPartitions(_.take(cap + 1)).collect()
    if (rows.length > cap) None else Some(rows)
  }
}
