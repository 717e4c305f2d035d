package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Merge-scan kernel for |A ∩ B| over two SORTED, DISTINCT string
  * arrays — O(n+m) with zero allocation, vs `size(array_intersect)`
  * which builds a hash set PER ROW. The set-similarity verify stages
  * (q133 AllPairs Jaccard, q143 containment) call this on every
  * candidate pair, with arrays produced by `sort_array(collect_set)`
  * — Spark's binary UTF8 string order, the same order `compareTo`
  * walks here, so the merge never misses an equal pair.
  */
object SortedIntersect {

  /** PRECONDITION (documented, not checked — checking would cost the
    * O(n) the kernel saves): both arrays ascending in UTF8 binary
    * order with distinct elements. `sort_array(collect_set(_))`
    * produces exactly this. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && j < m) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1L; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /** Column API: |a ∩ b| as BIGINT over sorted distinct ARRAY<STRING>. */
  def intersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCountExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Codegen'd |A ∩ B| for sorted distinct ARRAY<STRING> inputs (see
  * [[SortedIntersect.sortedIntersectCount]]). */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = Seq(left, right).map(_.dataType).filterNot {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count expects ARRAY<STRING> inputs, got " +
        bad.map(_.catalogString).mkString(", "))
  }
  override def dataType: DataType = LongType
  override protected def nullSafeEval(l: Any, r: Any): Any =
    SortedIntersect.sortedIntersectCount(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.SortedIntersect.sortedIntersectCount($l, $r)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCountExpr =
    copy(left = newLeft, right = newRight)
}
