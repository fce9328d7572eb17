package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-row PPJoin prefix selection over a packed shingle-hash set: returns
  * the document's `n - ceil(tEff*n) + 1` smallest shingles under the global
  * (document-frequency asc, hash asc) order — the classic PPJoin prefix
  * order, which concentrates prefixes on RARE shingles (tiny posting lists
  * in the candidate join) and pushes hot boilerplate shingles to the back,
  * outside every prefix.
  *
  * Rounds 1–2 ranked shingles by joining a df table onto every exploded
  * shingle row and running a per-document window: two shuffles and an AQE
  * round-trip per run. Here the df map rides an executor BROADCAST (fetched
  * once per executor, not per task) and the ranking is per-row column
  * compute inside whole-stage codegen. The caller bounds the broadcast
  * ([[graft.operators.Dedup.MaxBroadcastShingles]]) and falls back to the
  * join+window plan for corpora whose shingle vocabulary exceeds it — the
  * same adaptive posture as broadcast-vs-shuffle join selection.
  *
  * Prefix choice affects only candidate volume, never the result set:
  * qualifying pairs are guaranteed to survive by the completeness proof in
  * [[graft.operators.Dedup.ngramJaccardPairs]], which needs only ONE
  * consistent global total order.
  */
case class ShinglePrefix(child: Expression,
                         dfMap: Broadcast[(Array[Long], Array[Long])],
                         tEff: Double)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_prefix"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  // sh-sorted keys + aligned dfs; resolved lazily on the executor
  @transient private lazy val keys: Array[Long] = dfMap.value._1
  @transient private lazy val dfs: Array[Long] = dfMap.value._2

  /** Kernel: select the p smallest shingles under (df, sh). The input is a
    * per-document distinct set of at most a few hundred elements, so an
    * insertion sort over parallel arrays beats allocation-heavy generic
    * sorts. Shingles absent from the map (possible only when the caller
    * built the map from a different corpus) default to df = 1 — still a
    * consistent global order. */
  def prefixData(in: ArrayData): ArrayData = {
    val n = in.numElements()
    if (n == 0) return ShinglePrefix.emptyArray
    val p0 = n - math.ceil(tEff * n).toLong + 1
    val p = math.min(math.max(p0, 0L), n.toLong).toInt
    if (p == 0) return ShinglePrefix.emptyArray
    val sh = in.toLongArray() // fresh copy
    val df = new Array[Long](n)
    val ks = keys
    var i = 0
    while (i < n) {
      val idx = java.util.Arrays.binarySearch(ks, sh(i))
      df(i) = if (idx >= 0) dfs(idx) else 1L
      i += 1
    }
    // insertion sort by (df, sh), ascending
    i = 1
    while (i < n) {
      val dv = df(i); val sv = sh(i)
      var j = i - 1
      while (j >= 0 && (df(j) > dv || (df(j) == dv && sh(j) > sv))) {
        df(j + 1) = df(j); sh(j + 1) = sh(j); j -= 1
      }
      df(j + 1) = dv; sh(j + 1) = sv
      i += 1
    }
    new GenericArrayData(
      if (p == n) sh else java.util.Arrays.copyOf(sh, p))
  }

  override def nullSafeEval(input: Any): Any =
    prefixData(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shinglePrefix", this, classOf[ShinglePrefix].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.prefixData($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShinglePrefix =
    copy(child = newChild)
}

object ShinglePrefix {
  private val emptyArray = new GenericArrayData(Array.emptyLongArray)
}
