package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Corpus-trained character-bigram language model for statistical
  * quality scoring — the train-then-score stage every large text
  * pipeline runs (CCNet's KenLM perplexity filter is the canonical
  * form; this is its exactly-reproducible small sibling: an add-one
  * smoothed char-bigram model trained ON the corpus, scoring each
  * document's typicality against it).
  *
  * Dataflow is the classic two-pass model shape, and both passes are
  * the 100-TB-safe kind:
  *  1. TRAIN — explode every document into its |text|-1 bigrams and
  *     count. The explode is corpus-sized, but the hash aggregate's
  *     map-side combine collapses it to ≤ |alphabet|² rows inside the
  *     producing tasks — wordcount's shape. The model (bigram counts,
  *     context totals, vocabulary size) is tiny and broadcast.
  *  2. SCORE — re-explode, broadcast-join the model, integer-sum per
  *     document. One shuffle, keyed by doc.
  *
  * Every number is bit-reproducible by a SQL oracle: the smoothed
  * probability (cab+1)/(ca+V) is one IEEE division of integer-valued
  * doubles scaled to a long (half-up, the registry convention), and
  * the per-gram surprisal uses the INTEGER floor-log2
  * (length(bin(p))-1) rather than floating log2 — Spark computes
  * log2 as log(x)/log(2), whose last-ulp error at exact powers of
  * two would make floor() engine-dependent.
  */
object NgramLm {

  /** Spread a narrow input across the session's cores before a
    * corpus-sized explode. The explode multiplies work ~|text|-fold,
    * so a single-partition input (a small cached file) serializes the
    * whole gram stream onto one task. Conditional on a partition
    * DEFICIT: at scale the scan is already at least core-wide and
    * this is a no-op — no shuffle is ever added to a well-partitioned
    * corpus. */
  private[graft] def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Per-document bigram rows: (idCol, g). Documents shorter than 2
    * chars contribute nothing (and are re-attached by [[score]]). */
  private def bigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    widen(docs).filter(length(col(textCol)) >= 2)
      .select(col(idCol),
        explode(expr(s"transform(sequence(1, length($textCol) - 1), " +
          s"i -> substring($textCol, i, 2))")).as("g"))

  /** The trained model: one row per observed bigram with its count,
    * its context (first char) total, and the vocabulary size V =
    * number of distinct contexts. Bounded by |alphabet|² rows. */
  def model(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val gc = bigrams(docs, idCol, textCol).groupBy(col("g"))
      .agg(count(lit(1)).cast(LongType).as("cab"))
    val ca = gc.groupBy(substring(col("g"), 1, 1).as("a"))
      .agg(sum(col("cab")).as("ca"))
    val v = ca.agg(count(lit(1)).cast(LongType).as("vsz"))
    gc.join(ca, substring(col("g"), 1, 1) === col("a"))
      .crossJoin(broadcast(v))
      .select(col("g"), col("cab"), col("ca"), col("vsz"))
  }

  /** Score every document against the model: n_bigrams, the mean
    * scaled smoothed probability, and the mean integer-floor-log2
    * surprisal (higher = less typical). Zero-bigram docs surface with
    * n_bigrams = 0 and null means — never dropped. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            lm: DataFrame): DataFrame = {
    val p = round(lit(1e12) *
      ((col("cab").cast(DoubleType) + 1d) /
        (col("ca").cast(DoubleType) + col("vsz").cast(DoubleType))), 0)
      .cast(LongType)
    val scored = bigrams(docs, idCol, textCol)
      .join(broadcast(lm), "g")
      .withColumn("p", p)
      // integer floor-log2: p in [1, 1e12] ⊂ [2^0, 2^40)
      .withColumn("s", lit(40L) - (length(bin(greatest(col("p"), lit(1L)))) - 1))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast(LongType).as("n_bigrams"),
        sum(col("p")).as("sp"), sum(col("s")).as("ss"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        when(col("n_bigrams").isNull, lit(null).cast(LongType))
          .otherwise(round(col("sp").cast(DoubleType) /
            col("n_bigrams").cast(DoubleType), 0).cast(LongType))
          .as("mean_p_scaled"),
        when(col("n_bigrams").isNull, lit(null).cast(DoubleType))
          .otherwise(round(col("ss").cast(DoubleType) /
            col("n_bigrams").cast(DoubleType), 6))
          .as("mean_surprisal"))
  }

  /** Self-scoring convenience: train on `docs`, score `docs`. */
  def selfScore(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    score(docs, idCol, textCol, model(docs, idCol, textCol))
}

/** DSIR-style data selection (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling", arXiv:2302.03169):
  * hashed-n-gram bucket models over a TARGET corpus and a SOURCE
  * corpus, each document scored by its importance log-weight
  * log p_target(x) − log p_source(x), top-k selected.
  *
  * Exactly-reproducible form, same conventions as [[NgramLm]]:
  * char-bigrams hashed into a fixed B-bucket space with the registry's
  * md5 hash (both engines agree bit-for-bit), add-one smoothing over
  * (N + B) so every bucket has a defined probability in BOTH models —
  * hashing into a closed bucket space is what dissolves q98's
  * unseen-gram asymmetry — and the per-bucket log is the INTEGER
  * floor-log2 of the scaled probability, so the weight is an integer
  * sum, not a float accumulation whose order matters.
  *
  * 100-TB shape: one corpus-sized explode collapsed map-side to ≤ B
  * rows per task (wordcount), a ≤ B-row model broadcast back, one
  * doc-keyed shuffle for the weight sum, and the global top-k through
  * the bounded-buffer [[graft.plans.TopKPhysical]] (≤ k rows per
  * partition cross the wire — no full sort, no single-task window).
  * At extreme corpus sizes a bucket's scaled probability can round to
  * 0; the greatest(p, 1) guard pins its floor-log2 at 0 identically
  * in both engines.
  */
object DsirSelect {

  /** Per-occurrence bigram rows with the target flag — NO per-gram
    * hashing here: the bucket is a pure function of the gram, so md5
    * runs on the ≤ |alphabet|² DISTINCT grams (in [[select]]), never
    * on the corpus-sized occurrence stream. */
  private def bigrams(docs: DataFrame, idCol: String, textCol: String,
                      targetFlag: Column): DataFrame =
    NgramLm.widen(docs).filter(length(col(textCol)) >= 2)
      .select(col(idCol), targetFlag.as("tgt"),
        explode(expr(s"transform(sequence(1, length($textCol) - 1), " +
          s"i -> substring($textCol, i, 2))")).as("g"))

  /** Top-k most target-like documents: (idCol, n_bigrams, dsir_logw),
    * ranked by integer log-weight desc with id tie-break. Documents
    * with no bigrams have no weight and are not selectable.
    *
    * Plan shape mirrors [[NgramLm]] (the fast shape): the occurrence
    * stream only ever feeds few-group hash aggregates (groupBy gram ≤
    * |alphabet|² groups, groupBy doc) or a broadcast join — the bucket
    * model, totals, and the gram→weight map are all derived from the
    * tiny distinct-gram aggregate, whose exchange Spark reuses across
    * the model and scoring branches. */
  def select(docs: DataFrame, idCol: String, textCol: String,
             targetFlag: Column, nBuckets: Int, k: Int): DataFrame = {
    val bg = bigrams(docs, idCol, textCol, targetFlag)
    // distinct-gram corpus counts: the only aggregate over the
    // occurrence stream on the model side, ≤ |alphabet|² groups
    val gc = bg.groupBy(col("g")).agg(
      sum(when(col("tgt"), 1L).otherwise(0L)).cast(LongType).as("ct_g"),
      sum(when(!col("tgt"), 1L).otherwise(0L)).cast(LongType).as("cs_g"))
    val bucket = (Dedup.md5Int32(col("g")) % nBuckets).as("b")
    val m = gc.select(bucket, col("ct_g"), col("cs_g"))
      .groupBy(col("b"))
      .agg(sum(col("ct_g")).as("ct"), sum(col("cs_g")).as("cs"))
    val tot = m.agg(sum(col("ct")).as("nt"), sum(col("cs")).as("ns"))
    def scaledP(c: Column, n: Column): Column =
      round(lit(1e12) * ((c.cast(DoubleType) + 1d) /
        (n.cast(DoubleType) + nBuckets.toDouble)), 0).cast(LongType)
    def floorLog2(p: Column): Column =
      (length(bin(greatest(p, lit(1L)))) - 1).cast(LongType)
    val dlw = m.crossJoin(broadcast(tot))
      .select(col("b"),
        (floorLog2(scaledP(col("ct"), col("nt"))) -
          floorLog2(scaledP(col("cs"), col("ns")))).as("dlw"))
    // gram → weight map (≤ |alphabet|² rows): md5 runs here, on
    // distinct grams only, then broadcasts back onto the stream
    val gw = gc.select(col("g"), bucket)
      .join(broadcast(dlw), "b").select(col("g"), col("dlw"))
    val weighted = bg.join(broadcast(gw), "g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast(LongType).as("n_bigrams"),
        sum(col("dlw")).as("dsir_logw"))
      .withColumn("all", lit(0))
    graft.plans.TopKPhysical.topK(weighted, Seq("all"),
        Seq(("dsir_logw", false), (idCol, true)), k)
      .drop("all", "rnk")
  }
}
