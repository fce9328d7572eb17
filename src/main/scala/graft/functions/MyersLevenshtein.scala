package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact Levenshtein distance via Myers' bit-parallel algorithm (Myers,
  * JACM 1999, "A fast bit-vector algorithm for approximate string matching
  * based on dynamic programming"), in the blocked multi-word form of Hyyrö
  * (2003). One DP COLUMN advances with ~15 word ops per 64 pattern rows —
  * O(⌈m/64⌉·n) words against the O(m·n) cells of the classic two-row DP
  * that both Spark's builtin `levenshtein` and a scalar engine walk. On the
  * x41 verifier corpus (70–540-char docs) that is a 30–60× cut in cell
  * work per pair; the result is bit-identical to the builtin (same code
  * point semantics), so the DuckDB oracle is unchanged.
  *
  * Exactness: the bit vectors carry the ±1 vertical deltas of the standard
  * DP invariant (Dᵢⱼ − Dᵢ₋₁ⱼ ∈ {−1, 0, +1}); the horizontal carry `hin` of
  * +1 into block 0 encodes the global boundary row D₀ⱼ = j. Nothing is
  * approximated — this is the same recurrence, evaluated 64 rows at a
  * time. */
case class MyersLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_myers_levenshtein"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two string inputs, got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    BitLev.distance(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.BitLev.distance($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MyersLevenshtein =
    copy(left = newLeft, right = newRight)
}

object BitLev {

  /** Code point semantics match Spark's `UTF8String.levenshteinDistance`
    * (and DuckDB's `levenshtein`): distance over Unicode code points, not
    * UTF-16 chars or bytes. */
  def distance(a: UTF8String, b: UTF8String): Int =
    distance(a.toString, b.toString)

  def distance(sa: String, sb: String): Int = {
    val ca = codePoints(sa)
    val cb = codePoints(sb)
    // common prefix/suffix never participates in an optimal alignment's
    // cost — stripping it is the classic exactness-preserving shortcut and
    // collapses near-dup pairs (x41's whole population) to their edited core
    var lo = 0
    val maxLo = math.min(ca.length, cb.length)
    while (lo < maxLo && ca(lo) == cb(lo)) lo += 1
    var haId = ca.length; var hbId = cb.length
    while (haId > lo && hbId > lo && ca(haId - 1) == cb(hbId - 1)) {
      haId -= 1; hbId -= 1
    }
    // pattern = shorter remainder (fewer blocks); distance is symmetric
    val (p, pFrom, pTo, t, tFrom, tTo) =
      if (haId - lo <= hbId - lo) (ca, lo, haId, cb, lo, hbId)
      else (cb, lo, hbId, ca, lo, haId)
    val m = pTo - pFrom
    val n = tTo - tFrom
    if (m == 0) return n

    val blocks = (m + 63) >>> 6
    // Peq[c]: bit i of block k set iff pattern[64k + i] == c. ASCII-ish
    // patterns (the corpus) take a flat array; any code point ≥ 256 in the
    // pattern falls back to a hash map. Text chars missing from the table
    // simply match nowhere (Eq = 0), which is exactly correct.
    var asciiPeq: Array[Long] = null
    var mapPeq: java.util.HashMap[Integer, Array[Long]] = null
    var asciiOnly = true
    var i = pFrom
    while (asciiOnly && i < pTo) { asciiOnly = p(i) < 256; i += 1 }
    if (asciiOnly) {
      asciiPeq = new Array[Long](256 * blocks)
      var k = pFrom
      while (k < pTo) {
        val pos = k - pFrom
        asciiPeq(p(k) * blocks + (pos >>> 6)) |= 1L << (pos & 63)
        k += 1
      }
    } else {
      mapPeq = new java.util.HashMap[Integer, Array[Long]]()
      var k = pFrom
      while (k < pTo) {
        val pos = k - pFrom
        var arr = mapPeq.get(p(k))
        if (arr == null) { arr = new Array[Long](blocks); mapPeq.put(p(k), arr) }
        arr(pos >>> 6) |= 1L << (pos & 63)
        k += 1
      }
    }

    val pv = Array.fill(blocks)(-1L)
    val mv = new Array[Long](blocks)
    var score = m
    val last = blocks - 1
    val lastBit = 1L << ((m - 1) & 63)

    var j = tFrom
    while (j < tTo) {
      val c = t(j)
      val eqArr: Array[Long] =
        if (asciiOnly) { if (c < 256) asciiPeq else null }
        else mapPeq.get(c)
      val eqBase = if (asciiOnly && c < 256) c * blocks else 0
      var hin = 1 // global boundary: D[0][j] − D[0][j−1] = +1
      var blk = 0
      while (blk < blocks) {
        var eq = if (eqArr == null) 0L else eqArr(eqBase + blk)
        val pvb = pv(blk); val mvb = mv(blk)
        val xv = eq | mvb
        if (hin < 0) eq |= 1L
        val xh = (((eq & pvb) + pvb) ^ pvb) | eq
        var ph = mvb | ~(xh | pvb)
        var mh = pvb & xh
        if (blk == last) {
          if ((ph & lastBit) != 0L) score += 1
          else if ((mh & lastBit) != 0L) score -= 1
        }
        val hout =
          if ((ph & Long.MinValue) != 0L) 1
          else if ((mh & Long.MinValue) != 0L) -1
          else 0
        ph <<= 1; mh <<= 1
        if (hin > 0) ph |= 1L else if (hin < 0) mh |= 1L
        pv(blk) = mh | ~(xv | ph)
        mv(blk) = ph & xv
        hin = hout
        blk += 1
      }
      j += 1
    }
    score
  }

  private def codePoints(s: String): Array[Int] = {
    val n = s.codePointCount(0, s.length)
    val out = new Array[Int](n)
    var ci = 0; var k = 0
    while (k < n) {
      val cp = s.codePointAt(ci)
      out(k) = cp
      ci += Character.charCount(cp)
      k += 1
    }
    out
  }
}
