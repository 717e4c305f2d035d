package graft

import graft.functions.TextFns
import org.apache.spark.sql.functions._

/** Pins the PII scrub kernel (q191) on edge shapes the corpus lacks:
  * multiple PII per doc, adjacent hits, redaction order, and the \b
  * guards that stop partial number matches. */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def scrub(s: String): (Long, Long, Long, String) = {
    val r = Seq(s).toDF("t")
      .select(
        TextFns.piiCount(col("t"), TextFns.EmailRe).as("e"),
        TextFns.piiCount(col("t"), TextFns.Ipv4Re).as("i"),
        TextFns.piiCount(col("t"), TextFns.PhoneRe).as("p"),
        TextFns.redactPii(col("t")).as("red"))
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
  }

  test("detects and redacts all three PII classes in one doc") {
    val (e, i, p, red) =
      scrub("mail a.b+c@ex-1.co, host 10.0.255.7, dial 555-0042 twice 555-9999")
    assert((e, i, p) == (1L, 1L, 2L))
    assert(red == "mail <EMAIL>, host <IP>, dial <PHONE> twice <PHONE>")
  }

  test("no PII leaves text byte-identical") {
    val (e, i, p, red) = scrub("plain text with dots. and dashes - only")
    assert((e, i, p) == (0L, 0L, 0L))
    assert(red == "plain text with dots. and dashes - only")
  }

  test("word boundaries stop partial-number matches") {
    // 4-digit runs can't donate a 3-digit octet mid-number
    val (_, i, p, _) = scrub("version 1234.5.6.7890 build 1555-0042x")
    assert(i == 0L)
    assert(p == 0L)
  }

  test("email redaction runs before the looser numeric patterns") {
    val (e, i, _, red) = scrub("10user@h2.net vs 10.2.3.4")
    assert(e == 1L && i == 1L)
    assert(red == "<EMAIL> vs <IP>")
  }
}
