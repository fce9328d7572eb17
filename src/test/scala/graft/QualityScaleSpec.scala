package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.tagobjects.Slow

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Scale + semantics smoke for [[TextAnalysis.discreteThreshold]] — the
  * round-6 replacement for the per-group `collect_list` percentile (round-5
  * verdict's top scale finding): threshold state must be bounded by the
  * score's VALUE cardinality (4-decimal quality → ≤ ~10⁴ values), not the
  * group's member count. The 1M-docs-in-ONE-source case is exactly the
  * shape that OOMed the old mechanism in spirit (one aggregation buffer
  * holding every member); here it must both complete and return the exact
  * closed-form threshold.
  */
class QualityScaleSpec extends AnyFunSuite {
  import SparkTestSession.spark

  /** Local replica of [[TextAnalysis.qualityScore]] for all-stopword docs
    * of n tokens (en_hits = n_tokens = n). Spark's `round` is HALF_UP on
    * the BigDecimal of the double — replicate exactly. */
  private def q(n: Int): Double =
    BigDecimal(1.0 / (1.0 + math.exp(-(0.2 * math.log1p(n.toDouble) + 1.0))))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("discreteThreshold: rank can land inside a duplicate-value run") {
    val spark2 = spark
    import spark2.implicits._
    // n = 4, dropPm 500 → rank 2, which falls on the second copy of 1.0:
    // the count-table cumsum must yield thr = 1.0 (the sorted-list
    // element_at(…, 2) it replaces)
    val df = Seq(("s", 1.0), ("s", 1.0), ("s", 2.0), ("s", 3.0))
      .toDF("source", "quality")
    val got = TextAnalysis.discreteThreshold(df, dropPermille = 500)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq == Seq(("s", 1.0)))
    // rank 3 (dropPm 750 → ⌈3⌉ = 3) crosses past the run → thr = 2.0
    val got2 = TextAnalysis.discreteThreshold(df, dropPermille = 750)
      .collect().map(_.getDouble(1))
    assert(got2.toSeq == Seq(2.0))
    // dropPm 0 floors the rank at 1 → the group minimum
    val got0 = TextAnalysis.discreteThreshold(df, dropPermille = 0)
      .collect().map(_.getDouble(1))
    assert(got0.toSeq == Seq(1.0))
  }

  test("qualityGate: 1M docs in ONE source — bounded threshold state, " +
    "exact closed-form threshold and keep count", Slow) {
    // text = (id % 50 + 1) copies of the en-stopword "the": en_hits =
    // n_tokens = n, so quality = round(σ(0.2·ln(1+n) + 1), 4) — exactly 50
    // score classes of 20k docs each inside a single source. The old
    // collect_list threshold would buffer 10⁶ doubles in ONE aggregation
    // state; the count table holds ≤ 50 rows.
    val n = 1000000L
    val docs = spark.range(n).select(
      col("id").as("doc_id"), lit("cc").as("source"),
      expr("array_join(array_repeat('the', CAST(id % 50 + 1 AS INT)), ' ')")
        .as("text"))
    val t0 = System.nanoTime()
    val got = TextAnalysis.qualityGate(docs).collect()
    info(f"qualityGate over 1M docs / 1 source: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    // expected: the discrete percentile over the known multiset — 4-decimal
    // rounding may merge adjacent score classes, so fold counts by value
    val byValue = (1 to 50).groupBy(q).view.mapValues(_.size * 20000L)
      .toSeq.sortBy(_._1)
    val rank = (300L * n + 999) / 1000 // ⌈0.3·n⌉ exact
    val thr = byValue.scanLeft((0.0, 0L)) { case ((_, cum), (v, c)) =>
      (v, cum + c) }.drop(1).find(_._2 >= rank).get._1
    val kept = byValue.filter(_._1 >= thr).map(_._2).sum
    val r = got.head
    assert(got.length == 1)
    assert((r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)) ==
      ("cc", n, thr, kept))
    // and the plan really is the bounded mechanism: no collect_list anywhere
    val plan = TextAnalysis.discreteThreshold(
      docs.limit(10).select(col("source"), col("doc_id").cast("double")
        .as("quality")), 300)
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("collect_list"))
  }
}
