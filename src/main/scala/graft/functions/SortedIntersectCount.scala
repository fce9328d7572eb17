package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** |A ∩ B| for two SORTED-ascending long arrays via an allocation-free merge
  * scan — the verification kernel for the shingle-Jaccard candidate join.
  *
  * `size(array_intersect(a, b))` computes the same number but builds a
  * hash set per row; at tens of thousands of candidate pairs per corpus
  * that allocation dominates the verify stage. Inputs come from
  * [[ShingleSet]], which emits sorted arrays by construction. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> inputs, got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedArrayOps.intersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedArrayOps.intersectCount($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedArrayOps {
  /** Merge-scan intersection cardinality; both inputs sorted ascending.
    * Null ELEMENTS are skipped (the SQL registration accepts any
    * array<bigint>, where `getLong` on a null slot would silently read 0
    * and miscount) — ShingleSet output never contains them. */
  def intersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var n = 0
    while (i < na && j < nb) {
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val va = a.getLong(i); val vb = b.getLong(j)
        if (va < vb) i += 1
        else if (va > vb) j += 1
        else { n += 1; i += 1; j += 1 }
      }
    }
    n
  }
}
