package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic Bloom filter (Bloom 1970) as a DataFrame sketch —
  * the membership member of the engine's sketch family, next to KMV
  * (q79, distinct), HLL (q83, cardinality), the histogram CDF (q91,
  * quantiles) and CMS (q109, point frequency). The classic 100-TB use
  * is the runtime semi-join prefilter: build the filter over a
  * selective dim-side key set, broadcast its (word, bits) table, and
  * drop fact rows whose keys cannot be in the build set BEFORE the
  * shuffle join — Spark's own runtime bloom pushdown
  * (spark.sql.optimizer.runtime.bloomFilter.enabled) plays exactly
  * this trick; this operator is the engine-surfaced, cross-engine-
  * reproducible version (q110 oracles it against DuckDB bit-for-bit).
  *
  * Scale shape:
  *   - build is a wordcount-shaped aggregate: explode k md5-derived
  *     hashes per key, map-side-combine `bit_or` collapses every
  *     partition to ≤ `words` rows — counters MERGE BY OR, so the
  *     sketch is order- and partition-invariant and unions of
  *     filters are just `bit_or` over aligned words;
  *   - probe touches each probe key k times against a broadcast
  *     `words`-row table — no shuffle of the fact side beyond its
  *     own distinct;
  *   - no false negatives by construction; size `words` ≈ n_build/5
  *     (32 bits per word, k=3) for a sub-1% false-positive rate —
  *     q110 publishes the observed FP count next to the exact answer.
  *
  * Bits sit in the LOW 32 bits of each BIGINT word, so `1L << bit`
  * never touches the sign bit and Spark's and DuckDB's two's-
  * complement shifts agree exactly.
  */
object BloomFilter {

  /** k md5-derived 32-bit hashes of `keyCol`, exploded one per row as
    * column `h` alongside the key as `k`. ONE md5 per key — the k
    * hashes are disjoint 8-hex-digit slices of the digest (k ≤ 4; the
    * q109 CMS convention). The old per-hash `md5(key#i)` inside a
    * `transform` lambda evaluated interpreted (higher-order functions
    * have no codegen) and paid k digests per key; the flat
    * array-of-slices projection whole-stage-codegens. */
  private def hashed(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k <= 4, s"md5 has 32 hex digits = 4 disjoint 32-bit slices, got k=$k")
    val slices = (0 until k).map(i =>
      expr(s"CAST(conv(substring(_m, ${i * 8 + 1}, 8), 16, 10) AS BIGINT)"))
    df.select(col(keyCol).as("k"),
        md5(col(keyCol).cast("string")).as("_m"))
      .select(col("k"), explode(array(slices: _*)).as("h"))
  }

  /** Build the (word, bits) table from the build-side keys: `words`
    * rows at most, each holding 32 usable bits. */
  def build(keys: DataFrame, keyCol: String,
            words: Int = 1024, k: Int = 3): DataFrame =
    hashed(keys, keyCol, k)
      .groupBy(expr(s"(h DIV 32) % $words").as("word"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(h % 32 AS INT)))")
        .as("bits"))

  /** Probe: distinct keys of `df.keyCol` → (k, pass) where pass=1
    * iff every one of the k hash bits is set. `words`/`k` must match
    * the build call.
    *
    * Small sketches (≤ 64k words = 512 KB) fold into a LITERAL array
    * and all k bit tests evaluate on ONE row inside whole-stage
    * codegen — no k-fold explode, no join, no per-key re-aggregation
    * (the collect is `words`-bounded, the same class as the CMS/KMV
    * sketch reads). Past 64k words the broadcast-join form takes over
    * (a 100-TB-sized filter is built AND consumed distributed). An
    * absent word reads as bits=0, which fails every test — identical
    * to the join form's NULL handling. */
  def probe(df: DataFrame, keyCol: String, bloom: DataFrame,
            words: Int = 1024, k: Int = 3): DataFrame =
    if (words <= 65536) {
      require(k <= 4, s"md5 has 4 disjoint 32-bit slices, got k=$k")
      val bits = new Array[Long](words)
      bloom.collect().foreach { r =>
        val idx = r.getLong(0)
        // a build/probe `words` mismatch maps hashes to different word
        // slots on the two sides — semantically broken either way, so
        // fail loudly here instead of an opaque AIOOBE (or, worse, a
        // silently-wrong pass column when probe words > build words)
        require(idx >= 0 && idx < words,
          s"bloom word index $idx outside probe words=$words — " +
            "probe() must be called with the same `words` as build()")
        bits(idx.toInt) = r.getLong(1)
      }
      val tests = (0 until k).map { i =>
        val h = s"CAST(conv(substring(_m, ${i * 8 + 1}, 8), 16, 10) AS BIGINT)"
        s"(shiftright(element_at(_bits, CAST(($h DIV 32) % $words AS INT) + 1), " +
          s"CAST($h % 32 AS INT)) & 1) = 1"
      }.mkString(" AND ")
      df.select(col(keyCol)).distinct()
        .select(col(keyCol).as("k"), md5(col(keyCol).cast("string")).as("_m"),
          lit(bits).as("_bits"))
        .select(col("k"), expr(s"CASE WHEN $tests THEN 1 ELSE 0 END").as("pass"))
    } else {
      hashed(df.select(col(keyCol)).distinct(), keyCol, k)
        .select(col("k"), expr(s"(h DIV 32) % $words").as("word"),
          expr("CAST(h % 32 AS INT)").as("bit"))
        .join(broadcast(bloom), Seq("word"), "left")
        .select(col("k"), expr(
          "CASE WHEN bits IS NOT NULL AND (shiftright(bits, bit) & 1) = 1 " +
            "THEN 1 ELSE 0 END").as("hit"))
        .groupBy(col("k")).agg(min(col("hit")).as("pass"))
    }
}
