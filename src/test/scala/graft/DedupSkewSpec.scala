package graft

import graft.operators.{Dedup, EmbeddingDedup}
import org.apache.spark.sql.functions._

/** Skew-guard stress: thousands of IDENTICAL documents/vectors land in
  * one LSH bucket; without the cap the self-join emits O(n²) pairs
  * (≈12.5M for 5k dups). With the star fallback the candidate count
  * stays linear and every duplicate still pairs with the hub.
  */
class DedupSkewSpec extends SparkSpec {
  import spark.implicits._

  test("codegen shingle-hash kernel equals the composed md5 column form") {
    import graft.functions.{ShingleHashes, TextFns}
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "  spaced   out\ttokens \n and more  ",
      "\tleading tab then words here",  // Spark trim strips ONLY 0x20
      "trailing newline after words\n", // → edge \t/\n must match too
      "short one",            // < n tokens → empty
      "",                     // empty → empty
      "Cañón José über naïve façade résumé test").toDF("text")
    val viaKernel = docs.select(ShingleHashes(col("text"), 3).as("h"))
      .collect().map(_.getSeq[Long](0))
    val viaColumns = docs.select(
      transform(TextFns.shingles(col("text"), 3),
        s => graft.operators.Dedup.md5Int32(s)).as("h"))
      .collect().map(_.getSeq[Long](0))
    assert(viaKernel.toSeq == viaColumns.toSeq)
    assert(viaKernel(0).nonEmpty && viaKernel(4).isEmpty && viaKernel(5).isEmpty)
  }

  test("minhash hot bucket emits linear star pairs, not quadratic") {
    val nDup = 5000
    val docs = ((0 until nDup).map(i => (i.toLong, "the same exact duplicated text body repeated verbatim")) ++
      Seq((90001L, "a completely different document about spark physical planning"),
          (90002L, "a completely different document about spark physical planning"),
          (90003L, "yet another unique text body mentioning catalyst optimizer internals")))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text", maxBucket = 100)
      .cache()
    val n = pairs.count()
    // star shape: nDup-1 hub pairs for the dup cluster + 1 cold pair
    assert(n.toInt == (nDup - 1) + 1, s"expected linear pair count, got $n")
    // every duplicate is paired with the hub (min id 0) at est 1.0
    val hubPairs = pairs.filter(col("id_a") === 0L && col("est_jaccard") === 1.0).count()
    assert(hubPairs.toInt == nDup - 1)
    // the small identical pair (90001, 90002) survives the cold path
    assert(pairs.filter(col("id_a") === 90001L && col("id_b") === 90002L).count() == 1)
    pairs.unpersist()
  }

  test("embedding hot bucket emits linear star pairs at cosine 1") {
    val nDup = 3000
    val base = Array.fill(8)(0.5f)
    val vecs = ((0 until nDup).map(i => (i.toLong, base)) ++
      Seq((90001L, Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
          (90002L, Array(-1f, 0.2f, 0f, 0f, 0f, 0f, 0f, 0f))))
      .toDF("vec_id", "embedding")
    val pairs = EmbeddingDedup(vecs, "vec_id", "embedding",
      nPlanes = 4, threshold = 0.99, maxBucket = 100).cache()
    // all duplicates pair with hub id 0 at cosine 1; the two distinct
    // vectors are nowhere near threshold with anything
    assert(pairs.count().toInt == nDup - 1)
    assert(pairs.filter(col("id_a") === 0L && col("cosine") > 0.999).count().toInt == nDup - 1)
    pairs.unpersist()
  }
}
