package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass kernel: word n-gram shingles → md5-int32 hashes.
  *
  * Bit-identical to the composed column form
  * `transform(shingles(text, n), s -> conv(substr(md5(s),1,8),16,10))`
  * (tokenize on `\s+` after trim, join n-grams with a single space,
  * hash = first 4 md5 digest bytes as an unsigned 32-bit value) — the
  * DuckDB oracle reproduces the same numbers from the same SQL md5.
  * The composed form evaluates interpreted (higher-order functions
  * have no codegen) and materializes every shingle string as a Spark
  * array element; this kernel runs inside whole-stage codegen and
  * allocates only the output longs.
  */
object ShingleHash {

  def hashes(text: UTF8String, n: Int): ArrayData = {
    // Spark-exact tokenization via Md5Kernel, NOT java.lang.String
    // defaults — see that object's contract notes.
    val toks = Md5Kernel.tokenize(text.toString)
    if (toks.length < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](toks.length - n + 1)
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = Md5Kernel.md5Int32(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd shingle-hash expression (static call per row). */
case class ShingleHashesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ShingleHash.hashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHash.hashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

object ShingleHashes {
  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashesExpr(ColumnBridge.expression(text), n))
}

/** String sibling of [[ShingleHash]]: word n-gram shingles as
  * UTF8String array, same tokenize + single-space join — the kernel
  * behind `TextFns.shingles`, replacing the interpreted
  * `transform(sequence…, i -> array_join(slice…))` lambda with a
  * whole-stage-codegen static call (q133/q143/q165/q151/q154/q114 all
  * construct this stream before any shuffle). */
object ShingleString {
  def strings(text: UTF8String, n: Int): ArrayData = {
    val toks = Md5Kernel.tokenize(text.toString)
    if (toks.length < n)
      return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[AnyRef](toks.length - n + 1)
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd string-shingle expression (static call per row). */
case class ShingleStringsExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ShingleString.strings(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleString.strings($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleStringsExpr =
    copy(child = newChild)
}

object ShingleStrings {
  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleStringsExpr(ColumnBridge.expression(text), n))
}
