package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Long-micros fixed-point replacements for x94's exact-DECIMAL(38,6)
  * folds (the follow-up named in BASELINE.md's r11 x94 adjudication): a
  * 6-decimal rounding of a bounded double is an integer number of micros,
  * so the order-independent exact sum the DECIMAL discipline buys can be
  * accumulated as a primitive `long` — 64-bit adds instead of per-term
  * JVM Decimal allocations — as long as the totals stay inside a long.
  * They do, with enormous headroom: unit-normed embedding terms are ≤ 1
  * (≤ 10⁶ micros), so a d-length per-vector fold is ≤ d·10⁶ ≤ 10¹⁰ ≪ 2⁶³.
  *
  * Bit-identity with the DECIMAL path (spec-pinned in
  * `FixedPointFoldSpec`): per-term rounding reproduces Spark's
  * `round(x, 6)` double semantics EXACTLY — `BigDecimal(x)` on the
  * SHORTEST decimal representation (scala BigDecimal.apply(Double) =
  * java BigDecimal.valueOf), `setScale(6, HALF_UP)` (ties away from
  * zero) — via a fast floor path guarded by a tie band: only terms whose
  * |x|·10⁶ lands within 10⁻⁶ of a .5 boundary (or is too large for the
  * double's fractional resolution) take the exact BigDecimal route, so
  * the hot loop is a multiply + floor per term. The final doubles are
  * micros.toDouble / 1e6 — exact long→double (|micros| < 2⁵³) then one
  * correctly-rounded IEEE division, which is bit-identical to
  * `CAST(DECIMAL(38,6) AS DOUBLE)`'s correctly-rounded conversion of the
  * same rational value.
  *
  * Null semantics: a non-finite term rounds to itself (Spark `Round`
  * passes NaN/Inf through) and cannot be represented as a DECIMAL — the
  * kernels treat it as the TRY_CAST of the declarative shape would
  * (null), so [[DotNormMicros]] returns null for the whole row (a null
  * term poisons the `aggregate(..)` fold) and [[Round6Micros]] returns
  * a null ELEMENT (the SUM over exploded terms skips it). A
  * [[DotNormMicros]] length mismatch returns null like `zip_with`'s
  * null padding poisoning the fold.
  *
  * Out-of-contract magnitudes (ADVICE r12): the Long-micros fast loop
  * only holds while every term and partial sum fits a Long (|t| ≲
  * 9.2e12, never approached by unit-norm embeddings).
  * [[FixedPoint.dotNorm]] DETECTS the regime — a term past the guard
  * threshold or an `addExact` overflow — and re-folds that row through
  * an exact `java.math.BigDecimal` path that reproduces the
  * DECIMAL(38,6) fold wherever that fold yields a value. Where it
  * cannot (a term or running sum past 38 digits), the session's
  * ANSI-on default means the declarative route RAISES
  * (`NUMERIC_VALUE_OUT_OF_RANGE`, job dead); the kernel instead adopts
  * the TRY-variant semantics (`try_add`/`try_cast` → null row) so one
  * corrupt row degrades instead of killing a 100 TB job — the one
  * deliberate, documented divergence. Likewise
  * [[FixedPoint.roundArray]] mirrors its reference's NARROWER type —
  * the centroid pass's `CAST(round(x, 6) AS DECIMAL(12,6))` — which
  * under ANSI raises for |round6(x)| ≥ 10⁶; the kernel returns a null
  * ELEMENT there (`TRY_CAST` semantics; the downstream SUM skips it).
  * Both regimes are spec-pinned in `FixedPointFoldSpec` (values against
  * the DECIMAL fold where it evaluates, nulls where only the TRY forms
  * do). */
object FixedPoint {

  /** Exact replica of Spark's Round(double, 6) → micros, for finite t. */
  def exactRound6Micros(t: Double): Long =
    scala.math.BigDecimal(t)
      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
      .bigDecimal.movePointRight(6).longValueExact()

  /** Fast-path round-to-micros. HALF_UP is sign-symmetric (ties away from
    * zero), so work on |t| and restore the sign. The tie band: the double
    * product a = |t|·10⁶ differs from the exact decimal-expansion value
    * by < 2.3e-16·a (one IEEE rounding + the shortest-repr half-ulp), so
    * a fractional part farther than 10⁻¹²·a + 10⁻⁹ from .5 is decided
    * with > 4000× margin; inside the band — or past 10¹⁵ where a double's
    * integer-fraction resolution is gone — defer to the exact BigDecimal
    * path (on x94's |t| ≤ ~1 terms the band is ~10⁻⁹ wide: the slow path
    * fires on ~1 in 10⁹ random terms). Non-finite t must be handled by
    * the CALLER (null semantics differ per call site). */
  def round6Micros(t: Double): Long = {
    val a = math.abs(t) * 1e6
    if (a >= 1e15) return exactRound6Micros(t)
    val f = math.floor(a)
    val r = a - f
    if (math.abs(r - 0.5) < 1e-12 * a + 1e-9) return exactRound6Micros(t)
    val m = if (r > 0.5) f + 1d else f
    if (t < 0) -m.toLong else m.toLong
  }

  private val dotNormType = StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("s", DoubleType, nullable = false)))

  /** Terms at or past this magnitude could push round6 micros outside
    * Long range (2⁶³−1 micros ≈ 9.223e12); route the row to the exact
    * DECIMAL fold instead. Conservative by ~2% so the fast path never
    * has to reason about rounding at the boundary. */
  private val LongMicrosGuard = 9.0e12

  /** (Σ round6(v·c), Σ round6(v·v)) as doubles, or null (see object doc). */
  def dotNorm(va: ArrayData, ca: ArrayData): InternalRow = {
    val v = va.toDoubleArray()
    val c = ca.toDoubleArray()
    if (v.length != c.length) return null
    try {
      var d = 0L
      var s = 0L
      var i = 0
      while (i < v.length) {
        val x = v(i)
        val t1 = x * c(i)
        val t2 = x * x
        // isFinite(t2) also covers NaN x (NaN*NaN = NaN); a null term
        // poisons the declarative fold, so the whole row is null
        if (!java.lang.Double.isFinite(t1) ||
          !java.lang.Double.isFinite(t2)) return null
        if (math.abs(t1) >= LongMicrosGuard || t2 >= LongMicrosGuard)
          return dotNormExact(v, c)
        d = Math.addExact(d, round6Micros(t1))
        s = Math.addExact(s, round6Micros(t2))
        i += 1
      }
      new GenericInternalRow(Array[Any](d.toDouble / 1e6, s.toDouble / 1e6))
    } catch {
      // a partial sum outgrew Long micros (≥ ~9.2e12 accumulated out of
      // sub-guard terms) — out of contract for unit-norm inputs, but the
      // DECIMAL(38,6) fold this kernel replaces still has 20 digits of
      // headroom there, so reproduce it exactly
      case _: ArithmeticException => dotNormExact(v, c)
    }
  }

  /** The DECIMAL(38,6) fold verbatim, for rows the Long-micros loop
    * cannot hold: per-term round6 at full BigDecimal precision, exact
    * scale-6 accumulation. Overflow past DECIMAL(38,6)'s 38 digits
    * (term or sum) → null row, the TRY-variant of the ANSI fold that
    * would otherwise raise (see object doc). Finiteness rechecked here
    * because the caller may have bailed mid-array. */
  private def dotNormExact(v: Array[Double], c: Array[Double]): InternalRow = {
    val mc6 = scala.math.BigDecimal.RoundingMode.HALF_UP
    var d = java.math.BigDecimal.ZERO
    var s = java.math.BigDecimal.ZERO
    var i = 0
    while (i < v.length) {
      val x = v(i)
      val t1 = x * c(i)
      val t2 = x * x
      if (!java.lang.Double.isFinite(t1) ||
        !java.lang.Double.isFinite(t2)) return null
      val r1 = scala.math.BigDecimal(t1).setScale(6, mc6).bigDecimal
      val r2 = scala.math.BigDecimal(t2).setScale(6, mc6).bigDecimal
      if (r1.precision > 38 || r2.precision > 38) return null
      d = d.add(r1)
      s = s.add(r2)
      if (d.precision > 38 || s.precision > 38) return null
      i += 1
    }
    new GenericInternalRow(Array[Any](d.doubleValue(), s.doubleValue()))
  }

  /** Per-element round6 micros; non-finite elements → null ELEMENT (the
    * SUM over the exploded terms skips them). Elements whose rounding
    * reaches |10⁶| also → null ELEMENT: the replaced cast is to
    * DECIMAL(12,6) (6 integer digits), which overflows there — TRY_CAST
    * semantics, see the object doc (ADVICE r12). |x| ≥ 10⁶ can skip the
    * rounding (HALF_UP never shrinks magnitude below the floor, so the
    * result stays ≥ 10¹² micros); just under the boundary, round6 can
    * still carry UP to exactly 10⁶ (x ≥ 999999.9999995), so the
    * post-round check remains. */
  def roundArray(va: ArrayData): ArrayData = {
    val v = va.toDoubleArray()
    val out = new Array[Any](v.length)
    var i = 0
    while (i < v.length) {
      val x = v(i)
      out(i) =
        if (!java.lang.Double.isFinite(x) || math.abs(x) >= 1e6) null
        else {
          val m = round6Micros(x)
          if (m >= 1000000000000L || m <= -1000000000000L) null else m
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  def structType: StructType = dotNormType
}

/** struct(d, s) = (Σ round6(vᵢ·cᵢ), Σ round6(vᵢ²)) over two equal-length
  * array<double> columns — x94's fused dot+norm fold as one codegen
  * kernel. See [[FixedPoint]] for the exactness and null contract. */
case class DotNormMicros(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = FixedPoint.structType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot_norm_micros"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> inputs, got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    FixedPoint.dotNorm(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = graft.functions.FixedPoint.dotNorm($a, $b);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotNormMicros =
    copy(left = newLeft, right = newRight)
}

/** array<long> of round6 micros per element — the centroid pass's
  * per-term rounding as one primitive loop (the SUM downstream runs on
  * longs/decimals instead of per-term-rounded decimals). */
case class Round6Micros(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_round6_micros"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    FixedPoint.roundArray(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.FixedPoint.roundArray($c);")

  override protected def withNewChildInternal(newChild: Expression): Round6Micros =
    copy(child = newChild)
}
