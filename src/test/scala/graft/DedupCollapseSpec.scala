package graft.operators

import org.apache.spark.sql.functions.col

/** Direct contract pins for the round-13 identical-fingerprint group
  * collapse in [[Dedup.hammingPairs]] — controlled 60-bit fingerprints
  * (no text → simhash indirection), so cross-group Hamming distances
  * are exact by construction:
  *
  *  - groups UNDER the cap expand exactly: all duplicate-internal
  *    pairs at hamming 0 plus full member×member fan-out of every
  *    rep pair within maxHamming;
  *  - groups OVER the cap degrade to the linear hub-star shape both
  *    internally and in cross-group fan-out;
  *  - a duplicate-free frame takes the identical uncollapsed plan
  *    (same pair set either way).
  */
class DedupCollapseSpec extends graft.SparkSpec {

  // fingerprints: g1=0b000 ×3 members, g2=0b001 ×2 (hamming 1 from
  // g1), g4=0b111 ×1 (hamming 3 from g1, 2 from g2), g3=0xFF ×1
  // (≥5 from everything — must never pair)
  private val fps = Seq(
    1L -> 0L, 2L -> 0L, 3L -> 0L,
    10L -> 1L, 11L -> 1L,
    30L -> 7L,
    20L -> 255L)

  private def run(maxBucket: Int): Set[(Long, Long, Int)] = {
    val s = spark; import s.implicits._
    val sims = fps.toDF("id", "simhash")
    Dedup.hammingPairs(sims, bits = 60, maxHamming = 3, maxBucket = maxBucket)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("collapse: under-cap duplicate groups expand to the exact pair set") {
    val expected = (for {
      (a, sa) <- fps; (b, sb) <- fps
      if a < b && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b, java.lang.Long.bitCount(sa ^ sb))).toSet
    // sanity on the fixture: internal h0, cross h1/h2/h3, excluded h>3
    assert(expected((1L, 2L, 0)) && expected((1L, 10L, 1)) &&
      expected((10L, 30L, 2)) && expected((1L, 30L, 3)) &&
      !expected.exists(p => p._1 == 20L || p._2 == 20L))
    assert(run(maxBucket = 100) == expected)
  }

  test("collapse: an over-cap group emits hub-star pairs, linear not quadratic") {
    // g1 gets 6 members and the cap is 4: the GROUP cap engages for
    // g1 while the rep-level band buckets (4 distinct fingerprints
    // sharing the all-zero high bands) stay under the cap — this
    // isolates the group-cap contract from the band-bucket star cap
    val s = spark; import s.implicits._
    val fps6 = (1L to 6L).map(_ -> 0L) ++
      Seq(10L -> 1L, 11L -> 1L, 30L -> 7L, 20L -> 255L)
    val got = Dedup.hammingPairs(fps6.toDF("id", "simhash"),
        bits = 60, maxHamming = 3, maxBucket = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expected = Set(
      // g1 internal: star around hub 1 — NOT (2,3), (2,4), …
      (1L, 2L, 0), (1L, 3L, 0), (1L, 4L, 0), (1L, 5L, 0), (1L, 6L, 0),
      (10L, 11L, 0),              // g2 internal: m=2 ≤ cap, full
      (1L, 10L, 1), (1L, 11L, 1), // g1 fans out by hub only
      (1L, 30L, 3),
      (10L, 30L, 2), (11L, 30L, 2))
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
  }

  test("no duplicates → uncollapsed plan, same answer") {
    val s = spark; import s.implicits._
    val uniq = Seq(1L -> 0L, 10L -> 1L, 30L -> 7L, 20L -> 255L)
    val got = Dedup.hammingPairs(uniq.toDF("id", "simhash"),
        bits = 60, maxHamming = 3, maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expected = (for {
      (a, sa) <- uniq; (b, sb) <- uniq
      if a < b && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b, java.lang.Long.bitCount(sa ^ sb))).toSet
    assert(got == expected)
  }
}
