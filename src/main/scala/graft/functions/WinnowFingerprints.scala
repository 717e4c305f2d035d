package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
  * "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD'03; the MOSS algorithm). Used for rolling-hash document
  * fingerprinting / plagiarism-style overlap detection in the
  * LLM-pipeline dedup family (reference analogue: content-hash
  * identity, src/ETL_PROPERTIES/loader_v2.py:158-207, refined to
  * position-robust substring fingerprints).
  *
  * Per document: hash every k-char gram (char = codepoint, matching
  * SQL `substr` indexing on multibyte text; hash = first 8 md5 hex
  * digits as an unsigned 32-bit value, the same md5-prefix scheme the
  * minhash shingles use), then keep the minimum hash of each window
  * of w consecutive gram hashes. Guarantee: any shared substring of
  * length >= k + w - 1 contributes at least one SHARED fingerprint,
  * so an equi-join on fingerprint value finds all such overlaps — an
  * inverted index, never a cross join.
  *
  * Returns the document's distinct fingerprint values, ascending.
  * One pass, no per-position row explosion: the SQL-equivalent
  * explode → window-min → distinct runs inside this expression, so
  * the only shuffled rows are the ~2/(w+1)-density fingerprints.
  * Leading trim is Spark-exact (0x20 only).
  */
object WinnowFingerprint {

  def fingerprints(text: UTF8String, k: Int, w: Int): ArrayData = {
    val cps = Md5Kernel.sparkTrim(text.toString).codePoints().toArray
    val n = cps.length - k + 1 // number of k-grams
    if (n < w) return new GenericArrayData(Array.empty[Long])
    val h = new Array[Long](n)
    var i = 0
    while (i < n) {
      h(i) = Md5Kernel.md5Int32(new String(cps, i, k))
      i += 1
    }
    val out = new java.util.TreeSet[java.lang.Long]()
    i = w - 1
    while (i < n) {
      var m = h(i - w + 1)
      var j = i - w + 2
      while (j <= i) {
        if (h(j) < m) m = h(j)
        j += 1
      }
      out.add(m)
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  def apply(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprintsExpr(ColumnBridge.expression(text), k, w))
}

/** Codegen'd winnowing-fingerprint expression (static call per row). */
case class WinnowFingerprintsExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    WinnowFingerprint.fingerprints(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowFingerprint.fingerprints($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprintsExpr =
    copy(child = newChild)
}
