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

  test("out-of-contract magnitudes reproduce the DECIMAL reference " +
    "(ADVICE r12): guard-tripping terms take the exact fallback, " +
    "Long-micros sum overflow re-folds exactly, DECIMAL(38,6) overflow " +
    "nulls the row") {
    import org.apache.spark.sql.{GraftSqlBridge => B}
    import spark.implicits._
    val rows = Seq(
      // t1 = 1.2e13 past the 9.0e12 guard → per-term exact fallback
      (1L, Array(3.0e12, 1.5), Array(4.0, 0.5)),
      // sub-guard terms (t1 = 8.9e12 each → 8.9e18 micros) whose SUM
      // passes Long.MaxValue micros → addExact throws → exact re-fold
      (2L, Array(1.0e6, 1.0e6), Array(8.9e6, 8.9e6)),
      // twelve t2 = 1.024e31 terms sum past DECIMAL(38,6)'s 1e32 — the
      // strict ANSI fold RAISES here; the kernel (and the try_add
      // reference below) nulls instead
      (3L, Array.fill(12)(3.2e15), Array.fill(12)(0.0)),
      // in-contract control
      (4L, Array(0.25, -0.5), Array(0.5, 0.25))
    ).toDF("id", "v", "c")
    // the exact fold DotNormMicros replaces (verbatim from Similarity
    // for rows it can evaluate), with try_add in place of the ANSI `+`
    // so the row-3 overflow expresses the kernel's documented TRY
    // semantics instead of killing the test job
    val ref = expr(
      "aggregate(zip_with(v, c, (x, y) -> struct(" +
        "TRY_CAST(round(x * y, 6) AS DECIMAL(38,6)) AS d, " +
        "TRY_CAST(round(x * x, 6) AS DECIMAL(38,6)) AS s)), " +
        "struct(CAST(0 AS DECIMAL(38,6)) AS d, " +
        "CAST(0 AS DECIMAL(38,6)) AS s), " +
        "(a, e) -> struct(TRY_CAST(try_add(a.d, e.d) AS DECIMAL(38,6)) AS d, " +
        "TRY_CAST(try_add(a.s, e.s) AS DECIMAL(38,6)) AS s))")
    val out = rows.select(col("id"),
        B.column(graft.functions.DotNormMicros(
          B.expression(col("v")), B.expression(col("c")))).as("k"),
        ref.as("r"))
      .select(col("id"), col("k.d").as("kd"), col("k.s").as("ks"),
        col("r.d").cast("double").as("rd"), col("r.s").cast("double").as("rs"))
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(1L, 2L, 4L)) {
      val r = out(id)
      assert(!r.isNullAt(1) && !r.isNullAt(3), s"row $id must be non-null")
      assert(r.getDouble(1) == r.getDouble(3) && r.getDouble(2) == r.getDouble(4),
        s"row $id kernel=(${r.get(1)},${r.get(2)}) ref=(${r.get(3)},${r.get(4)})")
    }
    // row 3: the try-fold's s nulls on overflow (d stays 0 — the kernel
    // coarsens to a null ROW, which every consumer drops identically)
    assert(out(3L).isNullAt(4), "try-reference s must null on overflow")
    assert(out(3L).isNullAt(1) && out(3L).isNullAt(2),
      "kernel must null the row where the ANSI DECIMAL fold would raise")
  }

  test("Round6Micros mirrors DECIMAL(12,6) overflow-to-null per element " +
    "(ADVICE r12)") {
    import org.apache.spark.sql.{GraftSqlBridge => B}
    import spark.implicits._
    val v = Array(5.0, 1.0e6, -2.5e7, 999999.9999994, 999999.9999996, 1.0e13)
    val df = Seq(Tuple1(v)).toDF("v")
    // TRY_CAST: the strict ANSI cast raises at |round6(x)| ≥ 1e6; the
    // kernel's documented contract is the TRY form's null element
    val got = df.select(
        B.column(graft.functions.Round6Micros(B.expression(col("v")))).as("k"),
        expr("transform(v, x -> TRY_CAST(round(x, 6) AS DECIMAL(12,6)))").as("r"))
      .collect()(0)
    val k = got.getSeq[Any](0)
    val r = got.getSeq[java.math.BigDecimal](1)
    for (i <- v.indices) {
      if (r(i) == null)
        assert(k(i) == null, s"elem $i: ref overflows to null, kernel=${k(i)}")
      else
        assert(k(i) == r(i).movePointRight(6).longValueExact(),
          s"elem $i: kernel=${k(i)} ref=${r(i)}")
    }
    assert(k(1) == null && k(2) == null && k(4) == null && k(5) == null)
    assert(k(3) == 999999999999L, "just-under-boundary must stay a value")
  }
}
