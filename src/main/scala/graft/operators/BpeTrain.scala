package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.BpeApply

/** In-engine BPE tokenizer TRAINING loop (Sennrich et al. 2016,
  * arXiv:1508.07909) — the full-merge-table counterpart of q100's
  * single merge step, closing the train half of the train/apply pair
  * (apply = functions/BpeApply.scala).
  *
  * The real-trainer shape, kept at every step:
  *   - the corpus is touched exactly once, by the caller's
  *     word-frequency wordcount (map-side combine collapses it inside
  *     the scan tasks); the loop state is the VOCAB-sized table
  *     (word, freq, enc) — at 100 TB the vocabulary, not the corpus,
  *     bounds every iteration;
  *   - each step's pair count is a freq-weighted aggregate over that
  *     state (explode of per-word adjacent pairs → groupBy → sum,
  *     map-side combined to ≤ |pairs| rows);
  *   - the winner is a ONE-ROW collect (max count, then lexicographic
  *     (left, right) — the published tie-break), the same bounded
  *     driver artifact the q89 Lloyd step and q101's merge table
  *     already set the precedent for;
  *   - applying the winner is a single codegen `regexp_replace`
  *     rewrite of the SEP-wrapped encoding (BpeApply.mergeStep), and
  *     the state is `localCheckpoint`ed so lineage stays flat across
  *     iterations (the SemanticDedup precedent).
  *
  * The DuckDB oracle for q102 replays the identical algorithm as a
  * recursive CTE whose apply step is a `list_reduce` scanner (RE2 has
  * no lookahead, so the regex trick is not portable): merge when the
  * accumulator's last token equals `left` and the next token equals
  * `right`. That reduce equals the classic scanner pass because a
  * freshly merged token (`left || right`) can never itself equal
  * `left` (`right` is non-empty), so no chain-merging divergence is
  * possible within one step.
  *
  * reference: tokenizer surface / token budgeting
  * src/ETL_DOCS/processor.py:139
  */
object BpeTrain {

  /** Train `nMerges` merges over a `(word, freq)` table; returns the
    * merge table as `(rank: long, left, right)` rows, rank-ordered.
    * Stops early if the vocabulary runs out of adjacent pairs. */
  def merges(wf: DataFrame, nMerges: Int): Seq[(Long, String, String)] = {
    var state = wf
      .select(col("word"), col("freq"),
        BpeApply.charInit(col("word")).as("enc"))
      .localCheckpoint()
    val out = ArrayBuffer.empty[(Long, String, String)]
    var exhausted = false
    var rank = 0
    while (rank < nMerges && !exhausted) {
      val toks = filter(split(col("enc"), BpeApply.Sep), t => t =!= "")
      // adjacent token pairs, weighted by word frequency. The
      // size >= 2 guard matters: Spark's sequence(1, 0) would count
      // DOWN, fabricating pairs for single-token words.
      val best = state
        .select(col("freq"), toks.as("t"))
        .filter(size(col("t")) >= 2)
        .select(col("freq"), explode(
          expr("transform(sequence(1, size(t) - 1), " +
            "i -> struct(element_at(t, i) AS l, element_at(t, i + 1) AS r))"))
          .as("p"))
        .groupBy(col("p.l"), col("p.r"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1)
        .collect() // ONE row: the argmax merge — bounded driver artifact
      if (best.isEmpty) exhausted = true
      else {
        val (l, r) = (best(0).getAs[String]("l"), best(0).getAs[String]("r"))
        out += ((rank.toLong, l, r))
        state = state
          .withColumn("enc", BpeApply.mergeStep(col("enc"), l, r))
          .localCheckpoint()
        rank += 1
      }
    }
    out.toSeq
  }

  /** The merge table as a rank-ordered DataFrame `(rank, left,
    * right)` — the q102 registry surface. */
  def mergeTable(spark: SparkSession, wf: DataFrame, nMerges: Int): DataFrame = {
    import spark.implicits._
    merges(wf, nMerges)
      .toDF("rank", "left", "right")
      .select(col("rank").cast(LongType), col("left"), col("right"))
      .orderBy(col("rank"))
  }
}
