package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Per-row nearest-centroid assignment over a BROADCAST centroid matrix —
  * the IVF cell-assignment step as a single codegen kernel.
  *
  * The declarative formulation ([[graft.operators.Similarity.cellsRanked]])
  * is a broadcast cross join (corpus × k centroid rows) followed by a
  * per-vector ranking window — one exchange of k× the corpus row count per
  * run, and the right plan when the centroid table is unbounded. When the
  * centroids FIT a broadcast (they are k × dim doubles — 8 for the local
  * catalog queries, ~10⁵ × 64 ≈ 50 MB in the paper-regime IVF/SemDeDup
  * setups), this kernel does the same argmax as per-row column compute
  * inside whole-stage codegen: k sequential dots in a tight primitive loop,
  * centroids fetched once per EXECUTOR (broadcast), no join, no window, no
  * exchange at all.
  *
  * Semantics are IDENTICAL to the window path (`ORDER BY cdot DESC, cid
  * ASC` with `crn = 1`): dots accumulate left-to-right in doubles exactly
  * like [[DotProduct]], centroids are scanned in ascending-cid order, and a
  * strict `>` keeps the FIRST maximum — the lowest cid among exact-equal
  * dots. `PropertySpec` pins kernel ≡ window on random data.
  */
case class NearestCentroid(child: Expression,
                           cents: Broadcast[(Array[Long], Array[Array[Double]])])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  // cid-ascending ids + aligned vectors; resolved lazily on the executor
  @transient private lazy val cids: Array[Long] = cents.value._1
  @transient private lazy val cvs: Array[Array[Double]] = cents.value._2

  def nearest(in: ArrayData): Long = {
    val v = in.toDoubleArray()
    var best = 0
    var bestDot = Double.NegativeInfinity
    var i = 0
    while (i < cvs.length) {
      val c = cvs(i)
      val m = math.min(v.length, c.length)
      var dot = 0.0
      var j = 0
      while (j < m) { dot += v(j) * c(j); j += 1 }
      if (dot > bestDot) { bestDot = dot; best = i }
      i += 1
    }
    cids(best)
  }

  override def nullSafeEval(input: Any): Any =
    nearest(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroid", this,
      classOf[NearestCentroid].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.nearest($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** Top-`p` variant of [[NearestCentroid]] — the IVF PROBE list: the `p`
  * centroid ids ranked by (dot desc, cid asc), as one per-row kernel pass.
  * Element 1 is exactly [[NearestCentroid]]'s cell; elements 2..p are the
  * multi-probe cells `ivfTopKWith` reads off `crn ≤ nprobe` in the window
  * formulation. Tie semantics match the window's `ORDER BY cdot DESC, cid
  * ASC`: centroids are scanned in ascending-cid order and only a strictly
  * greater dot displaces a held entry. */
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
    val topDot = Array.fill(keep)(Double.NegativeInfinity)
    val topIdx = new Array[Int](keep)
    var i = 0
    while (i < cvs.length) {
      val c = cvs(i)
      val m = math.min(v.length, c.length)
      var dot = 0.0
      var j = 0
      while (j < m) { dot += v(j) * c(j); j += 1 }
      // insert: strictly greater displaces; equal dots keep the earlier
      // (lower) cid ahead — the window's (cdot DESC, cid ASC) order
      var k = keep
      while (k > 0 && dot > topDot(k - 1)) k -= 1
      if (k < keep) {
        var s = keep - 1
        while (s > k) { topDot(s) = topDot(s - 1); topIdx(s) = topIdx(s - 1); s -= 1 }
        topDot(k) = dot
        topIdx(k) = i
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.tabulate(keep)(s => cids(topIdx(s))))
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
