package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Embedding-vector column combinators over ARRAY<FLOAT> columns
  * (the reference stores vector(3072) in pgvector, reference:
  * src/shared/vector_store.py:85,177-181; our test `embeddings` table
  * is dim-64).
  *
  * Determinism note: dot products are accumulated as SCALED LONGS
  * (round(x*y*1e10)) rather than doubles — long addition is exact and
  * order-independent, so results are bit-identical regardless of Spark
  * partitioning AND reproducible by the DuckDB oracle, while costing
  * <1e-10 relative precision. Cosines derived from those longs are then
  * pure deterministic IEEE double ops.
  */
object VectorFns {

  /** Sum of round(x*y*1e10) as long — exact, order-independent.
    * Backed by the codegen'd [[DotScaledExpr]] kernel; the equivalent
    * `aggregate(zip_with(...))` higher-order form evaluates
    * interpreted and is ~100× slower at bench scale. */
  def dotScaled(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      DotScaledExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(a),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(b)))

  /** Squared L2 norm, same scaled-long encoding. */
  def normSqScaled(a: Column): Column = dotScaled(a, a)

  /** Cosine similarity from scaled-long dot/norms; NULL when either
    * vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val dot = dotScaled(a, b).cast(DoubleType)
    val na = normSqScaled(a).cast(DoubleType)
    val nb = normSqScaled(b).cast(DoubleType)
    when(na === 0 || nb === 0, lit(null).cast(DoubleType))
      .otherwise(dot / sqrt(na * nb))
  }

  /** Exact euclidean-squared in the scaled domain (for IVF-style
    * assignment where monotonicity is all that matters). */
  def l2SqScaled(a: Column, b: Column): Column =
    normSqScaled(a) - lit(2L) * dotScaled(a, b) + normSqScaled(b)

  /** Symmetric per-vector int8 quantization: q_i = round(x_i / s)
    * with s = max|x| / 127, so values land in [-127, 127]. Returns
    * ARRAY<BIGINT> (int8 range, wide type keeps downstream dot math
    * trivially exact). Zero vectors quantize to all-zero. 4-byte
    * floats → 1 byte of information per dimension: the standard
    * memory-bound scale path for a 100 TB embedding store, with exact
    * integer dot products replacing float math at query time.
    * Deterministic across engines: max/abs/divide are single IEEE
    * ops and the final round is HALF_UP on both sides (codegen'd
    * kernel, [[QuantizeInt8Expr]]). */
  def quantizeInt8(a: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      QuantizeInt8Expr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(a)))

  /** Exact integer dot over ARRAY<BIGINT> (codegen'd kernel). */
  def dotLong(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      DotLongExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(a),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(b)))

  /** Cosine similarity in the quantized domain; NULL on zero norms. */
  def cosineQ8(a: Column, b: Column): Column = {
    val dot = dotLong(a, b).cast(DoubleType)
    val na = dotLong(a, a).cast(DoubleType)
    val nb = dotLong(b, b).cast(DoubleType)
    when(na === 0 || nb === 0, lit(null).cast(DoubleType))
      .otherwise(dot / sqrt(na * nb))
  }

  /** SimHash of a token array under a d-bit hypercube: sign-aggregate
    * of per-token md5-derived bit vectors. Returns a long bitmask.
    * Base hash = first 15 hex chars of md5(token || '#' || bit) —
    * reproducible in any SQL engine with md5. */
  def simhash(tokens: Column, bits: Int = 16): Column = {
    // Per-bit vote: for each bit b, sum over tokens of (+1 if the last
    // md5(token#b) hex nibble is odd else -1); bit set when sum > 0.
    (0 until bits).map { b =>
      val vote = aggregate(tokens, lit(0L), (acc, t) => {
        val h = conv(substring(md5(concat(t, lit("#" + b))), 16, 1), 16, 10).cast(LongType)
        acc + when(h % 2 === 1, 1L).otherwise(-1L)
      })
      when(vote > 0, lit(1L) * (1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }
}
