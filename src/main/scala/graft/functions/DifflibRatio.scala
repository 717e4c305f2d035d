package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Faithful port of Python difflib.SequenceMatcher.ratio() — the
  * similarity the reference's brand fuzzy matcher thresholds at
  * 0.85/0.90 (reference: src/ETL_POIS/process_pois.py:185-213).
  * `levenshtein()` is NOT the same measure (SURVEY §7.4), so the
  * algorithm is ported: ratio = 2·M / (|a|+|b|) where M sums the
  * longest-matching-block decomposition, including difflib's autojunk
  * rule (elements covering >1% of b when |b| ≥ 200 are ignored as
  * anchors).
  */
object SequenceMatcherRatio {

  def ratio(aStr: String, bStr: String): Double = {
    val a = aStr.toCharArray
    val b = bStr.toCharArray
    if (a.length + b.length == 0) return 1.0

    // b2j with autojunk (no explicit junk predicate)
    val b2j = mutable.HashMap.empty[Char, mutable.ArrayBuffer[Int]]
    var j = 0
    while (j < b.length) {
      b2j.getOrElseUpdate(b(j), mutable.ArrayBuffer.empty[Int]) += j
      j += 1
    }
    if (b.length >= 200) {
      val ntest = b.length / 100 + 1
      val popular = b2j.collect { case (c, idxs) if idxs.length > ntest => c }
      popular.foreach(b2j.remove)
    }

    def findLongestMatch(alo: Int, ahi: Int, blo: Int, bhi: Int): (Int, Int, Int) = {
      var besti = alo; var bestj = blo; var bestsize = 0
      var j2len = mutable.HashMap.empty[Int, Int]
      var i = alo
      while (i < ahi) {
        val newj2len = mutable.HashMap.empty[Int, Int]
        b2j.get(a(i)) match {
          case Some(idxs) =>
            var p = 0
            var break = false
            while (p < idxs.length && !break) {
              val jj = idxs(p)
              if (jj < blo) ()
              else if (jj >= bhi) break = true
              else {
                val k = j2len.getOrElse(jj - 1, 0) + 1
                newj2len(jj) = k
                if (k > bestsize) { besti = i - k + 1; bestj = jj - k + 1; bestsize = k }
              }
              p += 1
            }
          case None =>
        }
        j2len = newj2len
        i += 1
      }
      // CPython's extension passes gate on isbjunk — the *junk* set
      // from the isjunk predicate, NOT autojunk's "popular" set. With
      // no isjunk (as here) bjunk is empty, so the first pass extends
      // over every equal element (popular chars included) and the
      // junk-only second pass never fires.
      var bi = besti; var bj = bestj; var bs = bestsize
      while (bi > alo && bj > blo && a(bi - 1) == b(bj - 1)) {
        bi -= 1; bj -= 1; bs += 1
      }
      while (bi + bs < ahi && bj + bs < bhi && a(bi + bs) == b(bj + bs)) bs += 1
      (bi, bj, bs)
    }

    // matching-blocks total via the same queue decomposition
    var matched = 0L
    val queue = mutable.Stack[(Int, Int, Int, Int)]((0, a.length, 0, b.length))
    while (queue.nonEmpty) {
      val (alo, ahi, blo, bhi) = queue.pop()
      val (i, jj, k) = findLongestMatch(alo, ahi, blo, bhi)
      if (k > 0) {
        matched += k
        if (alo < i && blo < jj) queue.push((alo, i, blo, jj))
        if (i + k < ahi && jj + k < bhi) queue.push((i + k, ahi, jj + k, bhi))
      }
    }
    2.0 * matched / (a.length + b.length)
  }
}

/** Catalyst expression wrapper (codegen = one static call/row). */
case class DifflibRatioExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(l: Any, r: Any): Any =
    SequenceMatcherRatio.ratio(
      l.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.SequenceMatcherRatio.ratio($l.toString(), $r.toString())")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DifflibRatioExpr =
    copy(left = newLeft, right = newRight)
}

object DifflibRatio {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(DifflibRatioExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
