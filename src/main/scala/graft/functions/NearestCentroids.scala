package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Per-row top-`p` nearest-centroid preference list over a BROADCAST
  * centroid matrix — the IVF cell-assignment and multi-probe steps as a
  * single codegen kernel. Element 1 is the cell (the argmax); elements
  * 2..p are the multi-probe cells `ivfTopKWith` reads off `crn ≤ nprobe`
  * in the window formulation.
  *
  * The declarative formulation ([[graft.operators.Similarity.cellsRanked]])
  * is a broadcast cross join (corpus × k centroid rows) followed by a
  * per-vector ranking window — one exchange of k× the corpus row count per
  * run, and the right plan when the centroid table is unbounded. When the
  * centroids FIT a broadcast (they are k × dim doubles — 8 for the local
  * catalog queries, ~10⁵ × 64 ≈ 50 MB in the paper-regime IVF/SemDeDup
  * setups), this kernel does the same ranking as per-row column compute
  * inside whole-stage codegen: k sequential dots in a tight primitive loop,
  * centroids fetched once per EXECUTOR (broadcast), no join, no window, no
  * exchange at all.
  *
  * Semantics are IDENTICAL to the window path (`ORDER BY cdot DESC, cid
  * ASC`): dots accumulate left-to-right in doubles exactly like
  * [[DotProduct]], centroids are scanned in ascending-cid order, and only
  * a strictly greater dot (under `java.lang.Double.compare` — NaN ranks
  * ABOVE +∞, exactly Spark's double ordering, so a NaN dot wins the cell
  * the way the window's `cdot DESC` ranks it first) displaces a held
  * entry — the lowest cid stays ahead among exact-equal dots.
  * `PropertySpec` pins kernel ≡ window on random data. */
case class NearestCentroids(child: Expression,
                            cents: Broadcast[(Array[Long], Array[Array[Double]])],
                            p: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_nearest_centroids"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  @transient private lazy val cids: Array[Long] = cents.value._1
  @transient private lazy val cvs: Array[Array[Double]] = cents.value._2

  def topCells(in: ArrayData): ArrayData = {
    val v = in.toDoubleArray()
    val keep = math.min(p, cvs.length)
    val topDot = new Array[Double](keep)
    val topIdx = new Array[Int](keep)
    var filled = 0
    var i = 0
    while (i < cvs.length) {
      val c = cvs(i)
      val m = math.min(v.length, c.length)
      var dot = 0.0
      var j = 0
      while (j < m) { dot += v(j) * c(j); j += 1 }
      // insert among the FILLED slots: strictly greater displaces; equal
      // dots keep the earlier (lower) cid ahead — the window's (cdot DESC,
      // cid ASC) order. Double.compare, not IEEE `>`: NaN must rank above
      // everything (Spark's double ordering), where `>` would skip it.
      var k = filled
      while (k > 0 && java.lang.Double.compare(dot, topDot(k - 1)) > 0) k -= 1
      if (k < keep) {
        var s = math.min(filled, keep - 1)
        while (s > k) { topDot(s) = topDot(s - 1); topIdx(s) = topIdx(s - 1); s -= 1 }
        topDot(k) = dot
        topIdx(k) = i
        if (filled < keep) filled += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.tabulate(filled)(s => cids(topIdx(s))))
  }

  override def nullSafeEval(input: Any): Any =
    topCells(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroids", this,
      classOf[NearestCentroids].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.topCells($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}
