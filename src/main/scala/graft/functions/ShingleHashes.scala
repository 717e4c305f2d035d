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

  private val ws = java.util.regex.Pattern.compile("\\s+")
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hashes(text: UTF8String, n: Int): ArrayData = {
    // Spark-exact tokenization, NOT java.lang.String defaults: Spark's
    // trim strips ONLY 0x20 (Java trim strips all <= U+0020) and
    // Spark's split keeps leading/trailing empty tokens (limit -1,
    // Java's default drops trailing ones). A doc edged with \t or \n
    // must shingle identically to the composed column form.
    val s0 = text.toString
    var b = 0; var e = s0.length
    while (b < e && s0.charAt(b) == ' ') b += 1
    while (e > b && s0.charAt(e - 1) == ' ') e -= 1
    val t = s0.substring(b, e)
    if (t.isEmpty) return new GenericArrayData(Array.empty[Long])
    val toks = ws.split(t, -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Long])
    val md = digest.get()
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
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
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
