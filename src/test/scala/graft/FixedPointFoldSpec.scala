package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FixedPoint
import graft.operators.Similarity
import graft.sources.Tables

/** The Long-micros fixed-point kernels (r12, the follow-up named in
  * BASELINE.md's r11 x94 adjudication) MUST be bit-identical to the
  * exact-DECIMAL(38,6) discipline they replace — the DuckDB oracle
  * evaluates the decimal form. Three layers: the scalar rounding against
  * Spark's own round(double, 6) semantics (incl. adversarial dyadic ties,
  * where naive Math.round-style floor(x+0.5) breaks on negatives), the
  * full x94 operator kernel ≡ DECIMAL on the real corpus, and the null
  * contracts (non-finite terms, length mismatch). */
class FixedPointFoldSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf0001}

  /** Spark's exact semantics, straight from RoundBase's double branch. */
  private def sparkRound6(t: Double): Double =
    if (t.isNaN || t.isInfinite) t
    else scala.math.BigDecimal(t)
      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble

  test("round6Micros ≡ Spark round(·, 6) on random magnitudes") {
    val rnd = new scala.util.Random(42)
    val values = Seq.fill(20000) {
      val mag = math.pow(10, rnd.nextInt(14) - 7) // 1e-7 .. 1e6
      (rnd.nextDouble() * 2 - 1) * mag
    } ++ Seq(0.0, -0.0, 1.0, -1.0, 1e-7, -1e-7, 123.4567895, 9.87654321e8)
    for (t <- values) {
      val viaKernel = FixedPoint.round6Micros(t).toDouble / 1e6
      val viaSpark = sparkRound6(t)
      // compare at 6 decimals: the spark path returns the DOUBLE nearest
      // the 6-decimal value; re-deriving its micros must match exactly
      val sparkMicros = scala.math.BigDecimal(viaSpark)
        .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
        .bigDecimal.movePointRight(6).longValueExact()
      assert(FixedPoint.round6Micros(t) == sparkMicros,
        s"t=$t kernel=$viaKernel spark=$viaSpark")
    }
  }

  test("round6Micros: dyadic ties round HALF_UP away from zero (the " +
    "negative-tie case a floor(x+0.5) shortcut gets wrong)") {
    // 2^-7 = 0.0078125 — exactly representable, 7th decimal digit is 5
    // with nothing after: a true HALF_UP tie at scale 6
    assert(FixedPoint.round6Micros(0.0078125) == 7813L)
    assert(FixedPoint.round6Micros(-0.0078125) == -7813L)
    assert(FixedPoint.round6Micros(3 * 0.0078125) == 23438L)
    assert(FixedPoint.round6Micros(-3 * 0.0078125) == -23438L)
    // 0.1015625 = 13/128, same construction at a larger magnitude
    assert(FixedPoint.round6Micros(0.1015625) == 101563L)
    assert(FixedPoint.round6Micros(-0.1015625) == -101563L)
    // and the spark reference agrees
    assert(sparkRound6(-0.0078125) == -0.007813)
    assert(sparkRound6(0.1015625) == 0.101563)
  }

  test("x94 operator: fixed-point route ≡ DECIMAL route on the corpus") {
    val emb = Tables.embeddings(spark, sf0001)
    val fixed = Similarity.labelCentroidOutliers(emb, fixedPoint = true)
    val dec = Similarity.labelCentroidOutliers(emb, fixedPoint = false)
    assert(fixed.exceptAll(dec).count() == 0)
    assert(dec.exceptAll(fixed).count() == 0)
    assert(fixed.count() > 0)
  }

  test("x94 operator: route parity holds under adversarial synthetic " +
    "vectors (dyadic ties, negatives, tiny/large magnitudes)") {
    import spark.implicits._
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.tabulate(16) { i =>
        val base = r.nextInt(5) match {
          case 0 => (r.nextInt(255) - 127) * 0.0078125 // dyadic tie feed
          case 1 => r.nextFloat() * 2f - 1f
          case 2 => (r.nextInt(19) - 9) * 0.1015625
          case 3 => r.nextFloat() * 1e-6f
          case _ => r.nextFloat() * 100f - 50f
        }
        base.toFloat
      }
    }
    val rows = (0 until 400).map(i => (i.toLong, s"L${i % 7}", vec(i)))
    val emb = rows.toDF("vec_id", "label", "embedding")
    val fixed = Similarity.labelCentroidOutliers(emb, fixedPoint = true)
    val dec = Similarity.labelCentroidOutliers(emb, fixedPoint = false)
    assert(fixed.exceptAll(dec).count() == 0)
    assert(dec.exceptAll(fixed).count() == 0)
    assert(fixed.count() > 0)
  }

  test("null contracts: non-finite terms and length mismatch") {
    import org.apache.spark.sql.{GraftSqlBridge => B}
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0, 2.0), Array(0.5, 0.25)),
      (2L, Array(Double.NaN, 2.0), Array(0.5, 0.25)),
      (3L, Array(1.0, Double.PositiveInfinity), Array(0.5, 0.25)),
      (4L, Array(1.0, 2.0), Array(0.5, 0.25, 0.125))
    ).toDF("id", "v", "c")
    val out = df.select(col("id"), B.column(graft.functions.DotNormMicros(
      B.expression(col("v")), B.expression(col("c")))).as("ds"))
      .select(col("id"), col("ds.d"), col("ds.s"))
      .collect().map(r => r.getLong(0) -> (r.isNullAt(1), r.isNullAt(2)))
      .toMap
    assert(out(1L) == (false, false))
    assert(out(2L) == (true, true), "NaN term must null-poison the fold")
    assert(out(3L) == (true, true), "Inf term must null-poison the fold")
    assert(out(4L) == (true, true), "length mismatch must null like " +
      "zip_with's null padding")
    val arr = df.where(col("id") === 2L)
      .select(B.column(graft.functions.Round6Micros(
        B.expression(col("v")))).as("m"))
      .collect()(0).getSeq[Any](0)
    assert(arr(0) == null, "non-finite element → null ELEMENT (SUM skips)")
    assert(arr(1) == 2000000L)
  }
}
