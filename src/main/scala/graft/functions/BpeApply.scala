package graft.functions

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenizer-APPLY side of BPE (Sennrich et al. 2016,
  * arXiv:1508.07909): encode a word column with an already-trained
  * merge table (the artifact a q100-style trainer loop produces).
  *
  * Pure codegen, no UDF: the merge table is a tokenizer ARTIFACT
  * (tens of rows), so it is unrolled at plan-build time into a chain
  * of literal `regexp_replace` calls — one per merge, in rank order —
  * and the whole encode stays inside whole-stage codegen. Nothing
  * ships to executors but the expression tree.
  *
  * Applying merges once each in rank order (replacing all occurrences
  * left-to-right) equals the classic greedy lowest-rank-first scanner
  * loop PROVIDED no merge's output string equals an operand of an
  * earlier-ranked pair (else that pair could become adjacent again
  * after its turn has passed). Classic BPE almost always satisfies
  * this — a token is normally learned once — but it is not a theorem
  * over arbitrary tables, so [[tokens]] verifies the precondition
  * against the actual artifact and fails loudly if it ever breaks.
  *
  * reference: token budgeting / tokenizer surface
  * src/ETL_DOCS/processor.py:139
  */
object BpeApply {

  /** Token delimiter inside the working string — a control char that
    * cannot appear in whitespace-split corpus words. */
  val Sep = "\u0001"

  /** Rank-order application is only exact when no merge's output
    * string can rebuild an operand of an earlier-ranked pair. */
  private def requireNoResurrection(merges: Seq[(String, String)]): Unit =
    for {
      (pair, p) <- merges.zipWithIndex
      m <- (p + 1) until merges.size
      cat = merges(m)._1 + merges(m)._2
    } require(cat != pair._1 && cat != pair._2,
      s"BPE merge table violates rank-order application: rank $m " +
        s"(${merges(m)}) re-creates operand '$cat' of rank $p ($pair); " +
        "greedy min-rank apply would differ — regenerate the table or " +
        "encode with a scanner loop")

  /** "ab" -> "<SEP>a<SEP>b<SEP>": one SEP before every code point,
    * plus a trailing SEP — the working representation every merge
    * step rewrites in place. */
  def charInit(word: Column): Column =
    concat(regexp_replace(word, "(?s)(.)", Sep + "$1"), lit(Sep))

  /** Apply ONE merge to a SEP-wrapped token string: a left-to-right
    * non-overlapping replace whose trailing boundary is a LOOKAHEAD
    * (not consumed), so back-to-back occurrences merge like the
    * scanner loop: [a,a,a,a] → [aa,aa], [a,a,a] → [aa,a]. Also the
    * training-loop step (operators/BpeTrain.scala). */
  def mergeStep(cur: Column, l: String, r: String): Column =
    regexp_replace(
      cur,
      Pattern.quote(Sep + l + Sep + r) + "(?=" + Sep + ")",
      Matcher.quoteReplacement(Sep + l + r))

  /** `word` → SEP-wrapped token string after all merges in rank
    * order, e.g. `<SEP>sp<SEP>ark<SEP>`. */
  private def merged(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(charInit(word)) { case (cur, (l, r)) =>
      mergeStep(cur, l, r)
    }

  /** Encoded subword tokens as `array<string>`. */
  def tokens(word: Column, merges: Seq[(String, String)]): Column = {
    requireNoResurrection(merges)
    filter(split(merged(word, merges), Sep), t => t =!= "")
  }
}
