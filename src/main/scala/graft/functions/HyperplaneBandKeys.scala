package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass hyperplane-LSH band keys over an `array<double>` embedding:
  * returns `array<long>` of `bands` keys, key `b` = the sign pattern of the
  * dots against planes `b·r .. b·r+r-1` (bit j set ⇔ dot ≥ 0).
  *
  * Why a kernel (SURVEY.md §2.10 tier (b)): the declarative form — one
  * `DotProduct(cast(emb), array(64 literals))` per plane — re-evaluates the
  * float→double cast and the literal array per plane per row (~200µs/row for
  * 32 planes, measured); this expression reads the vector once and runs all
  * planes in a tight primitive loop (~2µs/row). Arithmetic is EXACTLY the
  * declarative/oracle form: widen-then-multiply, strict left-to-right
  * summation over min(len, dim) elements, `dot >= 0` sign test —
  * [[graft.KernelParitySpec]] pins kernel ≡ declarative on real vectors.
  */
case class HyperplaneBandKeys(child: Expression, bands: Int, rowsPerBand: Int,
                              dim: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hyperplane_band_keys"

  override def nullSafeEval(input: Any): Any =
    HyperplaneKernel.bandKeys(input.asInstanceOf[ArrayData], bands, rowsPerBand, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HyperplaneKernel.bandKeys(" +
        s"$c, $bands, $rowsPerBand, $dim);")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBandKeys =
    copy(child = newChild)
}

object HyperplaneKernel {

  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  /** Planes 0..numPlanes-1 as dense rows (Portable.plane — deterministic,
    * identical to the literal arrays the declarative form and the DuckDB
    * oracle use). */
  def planes(numPlanes: Int, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((numPlanes, dim),
      _ => Array.tabulate(numPlanes)(i => Portable.plane(i, dim)))

  def bandKeys(v: ArrayData, bands: Int, rowsPerBand: Int, dim: Int): ArrayData = {
    val ps = planes(bands * rowsPerBand, dim)
    val n = math.min(v.numElements(), dim)
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var j = 0
      while (j < rowsPerBand) {
        val p = ps(b * rowsPerBand + j)
        var s = 0.0
        var i = 0
        while (i < n) { s += v.getDouble(i) * p(i); i += 1 }
        if (s >= 0) key |= (1L << j)
        j += 1
      }
      keys(b) = key
      b += 1
    }
    new GenericArrayData(keys)
  }
}
