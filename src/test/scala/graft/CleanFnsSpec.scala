package graft

import graft.functions.{CleanFns, HashFns}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Semantics pinned against the reference cleaners
  * (loader_v2.py:16-88) — dirty-value cases from FIXTURES.md §A1. */
class CleanFnsSpec extends SparkSpec {
  import spark.implicits._

  private def priceOf(raw: String, cur: String): (Double, String) = {
    val r = Seq((raw, cur)).toDF("v", "c")
      .select(CleanFns.cleanPrice(col("v"), col("c")).as("p"))
      .select("p.price", "p.currency").head()
    (r.getDouble(0), r.getString(1))
  }

  test("clean_price basic + currency whitelist") {
    assert(priceOf("1,200.50", "USD") == (1200.5, "USD"))
    assert(priceOf("95.000", "EUR") == (95.0, "USD"))   // non-whitelist → USD
    assert(priceOf("  42  ", "crc") == (42.0, "CRC"))   // case-insensitive
  }

  test("clean_price multi-dot repair keeps last dot as decimal") {
    assert(priceOf("$1.234.567,89", "USD") == (1234567.89, "CRC"))
    assert(priceOf("1.2.3", "USD") == (12.3, "USD"))
  }

  test("clean_price caps and heuristics ordered like the reference") {
    assert(priceOf("99999999999999.99", "CRC") == (0.0, "USD")) // > cap → 0/USD
    assert(priceOf("2000000", "USD") == (2000000.0, "CRC"))     // >1e6 → CRC
    assert(priceOf("junk", "CRC") == (0.0, "USD"))
    val r = Seq(("", "keepme")).toDF("v", "c")
      .select(CleanFns.cleanPrice(col("v"), col("c")).as("p"))
      .select("p.price", "p.currency").head()
    assert(r.getDouble(0) == 0.0 && r.getString(1) == "keepme") // empty → raw currency
  }

  test("clean_area bounds, no multi-dot repair") {
    def area(s: String) = Seq(s).toDF("v")
      .select(CleanFns.cleanArea(col("v")).as("a")).head()
    // the digit in "m2" survives the strip — same as the reference's
    // re.sub: "120,5 m2" → "120.52"
    assert(area("120,5 m2") == Row(120.52))
    assert(area("1.2.3") == Row(null))        // float() would fail
    assert(area("0") == Row(null))            // non-positive
    assert(area("99999999") == Row(null))     // > cap
  }

  test("clean_smallint first integer group with cap") {
    def si(s: String, cap: Long) = Seq(s).toDF("v")
      .select(CleanFns.cleanSmallint(col("v"), cap).as("n")).head()
    assert(si("3 bedrooms", 100) == Row(3L))
    assert(si("no numbers", 100) == Row(null))
    assert(si("40000", 30000) == Row(null))
    assert(si("99999999999999999999999", 30000) == Row(null)) // bigint-safe
  }

  test("content hash is stable and feature-order independent") {
    val df = Seq(
      ("t", "100", "USD", "50", "9.9", "-84.1", Map("a" -> "1", "b" -> "2")),
      ("t", "100", "USD", "50", "9.9", "-84.1", Map("b" -> "2", "a" -> "1"))
    ).toDF("title", "price", "cur", "sqm", "lat", "lng", "feat")
      .select(HashFns.contentHash(col("title"), col("price"), col("cur"),
        col("sqm"), col("lat"), col("lng"), col("feat")).as("h"))
    val hs = df.collect().map(_.getString(0))
    assert(hs(0) == hs(1) && hs(0).length == 64)
  }

  test("poi hash uses 6-decimal coordinate formatting") {
    val h = Seq((9.123456789, -84.0)).toDF("lat", "lon")
      .select(HashFns.poiHash(lit("Education"), col("lat"), col("lon")).as("h"))
      .head().getString(0)
    val expected = java.security.MessageDigest.getInstance("SHA-256")
      .digest("Education|9.123457|-84.000000".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(h == expected)
  }
}
