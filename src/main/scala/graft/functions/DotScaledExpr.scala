package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Tight-loop kernel for the scaled-long dot product. */
object VectorKernels {

  /** Exact HALF_UP (round half away from zero) of a double to long —
    * bit-identical to Spark's `round(x, 0)` (BigDecimal HALF_UP)
    * without allocating: `rint` (half-even) differs from HALF_UP only
    * when the double is EXACTLY k+0.5, which is detectable exactly. */
  def halfUpLong(x: Double): Long = {
    val fl = math.floor(x)
    if (x - fl == 0.5) {
      if (x >= 0) fl.toLong + 1L else fl.toLong
    } else math.rint(x).toLong
  }

  /** Σ round(a_i·b_i·1e10) over float arrays, exact long accumulation. */
  def dotScaled(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += halfUpLong(a.getFloat(i).toDouble * b.getFloat(i).toDouble * 1e10)
      i += 1
    }
    s
  }
}

/** Codegen'd scaled-long dot product over two ARRAY<FLOAT> columns.
  * Replaces the `zip_with`+`aggregate` higher-order formulation, which
  * Spark evaluates interpreted (HOFs have no codegen) at ~µs/element —
  * this is a single static call into a primitive loop, ~100× faster,
  * with identical values (same IEEE products, same HALF_UP rounding,
  * same exact long accumulation). Arrays must be non-null element-wise
  * (embedding columns are). */
case class DotScaledExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorKernels.dotScaled(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.VectorKernels.dotScaled($l, $r)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotScaledExpr =
    copy(left = newLeft, right = newRight)
}
