package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass classic SimHash (Charikar 2002 / Manku et al. WWW'07):
  * ONE md5 per token whose first 15 hex digits give a 60-bit token
  * hash; each of the 60 bits votes ±1; fingerprint bit b is set when
  * the bit-b vote sum is positive.
  *
  * This is the wide fingerprint behind near-dup pair mining
  * (reference semantics: content-hash change detection,
  * src/ETL_PROPERTIES/loader_v2.py:158-207, generalized to
  * similarity-preserving hashing for the LLM-pipeline dedup family).
  * It differs from [[VectorFns.simhash]] (the 16-bit per-bit-md5 vote
  * variant kept for q24's oracle): one digest per token instead of
  * one per token×bit, and 60 bits instead of 16, so Hamming banding
  * yields near-singleton buckets instead of 200+-doc buckets.
  *
  * 60 bits (15 hex digits), not 64, so the value is a non-negative
  * BIGINT on both engines: DuckDB's `('0x' || substr(md5(x), 1, 15))
  * ::BIGINT` reproduces the token hash exactly, and arithmetic `>>`
  * band extraction needs no sign handling on either side.
  *
  * Tokenization is Spark-exact and identical to [[TextFns.tokens]]:
  * strip 0x20 only, empty → no tokens (fingerprint 0), else split on
  * `\s+` with limit -1.
  */
object SimHashWide {

  val Bits = 60

  def simhash60(text: UTF8String): Long = {
    val toks = Md5Kernel.tokenize(text.toString)
    if (toks.isEmpty) return 0L
    val votes = new Array[Int](Bits)
    var i = 0
    while (i < toks.length) {
      val h = Md5Kernel.md5Int60(toks(i))
      var bit = 0
      while (bit < Bits) {
        if (((h >> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < Bits) {
      if (votes(bit) > 0) out |= 1L << bit
      bit += 1
    }
    out
  }

  def apply(text: Column): Column =
    ColumnBridge.column(SimHashWideExpr(ColumnBridge.expression(text)))
}

/** Codegen'd wide-simhash expression (static call per row). */
case class SimHashWideExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    SimHashWide.simhash60(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashWide.simhash60($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHashWideExpr =
    copy(child = newChild)
}
