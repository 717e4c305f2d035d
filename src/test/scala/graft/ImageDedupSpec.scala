package graft

import graft.operators.ImageDedup
import org.apache.spark.sql.functions._

/** Pins the perceptual image near-dup operator:
  *  - the Scala dHash reproduces the fixture generator's independent
  *    pure-Python computation bit-for-bit (PNG is lossless);
  *  - the semantic claims the operator exists for: byte-dups,
  *    re-encodes, global brightness shifts, and resizes all pair at
  *    hamming 0 with the base image; a localized perturbation pairs
  *    at a small positive distance; unrelated noise images pair with
  *    nothing; undecodable payloads hash NULL and never pair;
  *  - the hot-bucket star cap degrades a mass-duplicate bucket to
  *    linear star pairs, not quadratic (the DedupSkewSpec guarantee,
  *    exercised through the image entry point).
  */
class ImageDedupSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = graft.util.RepoRoot.fixture("image_assets.parquet")
  private val expected = graft.util.RepoRoot.fixture("image_dhash_expected.parquet")

  test("dhash matches the independent fixture computation bit-for-bit") {
    val got = ImageDedup.withDhash(
        spark.read.parquet(fixture), "asset_id", "content")
      .orderBy("asset_id")
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val want = spark.read.parquet(expected)
      .orderBy("asset_id")
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == want)
    assert(got(12L).isEmpty, "non-image payload must hash NULL")
  }

  test("near-dup pairs: re-encode/brightness/resize at 0, noise never") {
    val pairs = ImageDedup.nearDupPairs(
        spark.read.parquet(fixture), "asset_id", "content", maxHamming = 6)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2)))
      .toMap
    // byte-dup, re-encode, +16 brightness, 45x40 resize: all hamming 0
    Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 6L)).foreach { p =>
      assert(pairs.get(p).contains(0), s"$p should pair at hamming 0")
    }
    // localized perturbation: near but not identical
    assert(pairs.get((1L, 5L)).exists(h => h > 0 && h <= 6))
    // noise images (7-11) and the undecodable asset (12) pair with nothing
    val touched = pairs.keys.flatMap(p => Seq(p._1, p._2)).toSet
    assert(touched.intersect((7L to 12L).toSet).isEmpty,
      s"unrelated/undecodable assets paired: $pairs")
  }

  test("mass-duplicate bucket degrades to linear star pairs") {
    val base = spark.read.parquet(fixture)
      .filter(col("asset_id") === 1).select(col("content")).head().getAs[Array[Byte]](0)
    val n = 40
    val many = (1L to n.toLong).map(i => (i, base)).toDF("asset_id", "content")
    val pairs = ImageDedup.nearDupPairs(many, "asset_id", "content",
      maxHamming = 6, maxBucket = 10)
    // above the cap: star topology (everyone vs the min-id hub) =
    // n-1 pairs, not n*(n-1)/2
    assert(pairs.count() == n - 1)
    assert(pairs.filter(col("id_a") === 1).count() == n - 1)
  }
}
