package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Batch-gradient perceptron TRAINING over hashed bag-of-words
  * features — the in-engine trainer for the linear text filters a
  * curation pipeline runs at corpus scale (fastText-style language /
  * quality gates: Joulin et al. 2016, arXiv:1607.01759 train exactly
  * this shape — a linear classifier over hashed n-gram features;
  * CCNet and the LLaMA data pipeline deploy such filters as
  * keep/drop gates). Fourth member of the iterative trainer family
  * next to Lloyd's step ([[KMeansTrain]]), power iteration (q171),
  * and the BPE merge loop ([[BpeTrain]]).
  *
  * The classic perceptron (Rosenblatt 1958) updates after EVERY
  * example — inherently sequential and row-order-dependent, so it
  * could never match a declarative oracle. This is the BATCH variant
  * (each round updates on the sum over ALL currently-misclassified
  * examples), whose update is one order-independent integer
  * aggregate per round:
  *
  *   margin_d = Σ_b w_b · x_{d,b}          (exact int64)
  *   miss     = { d : y_d · margin_d ≤ 0 }
  *   w'_b     = w_b + Σ_{d ∈ miss} y_d · x_{d,b}
  *
  * Deterministic by construction — integer weights, integer counts,
  * sums of longs — so a DuckDB unrolled-CTE oracle replays the whole
  * training run bit-for-bit (q180; the q171 oracle convention).
  *
  * Scale shape: features collapse ONCE to one array-pair row per
  * document (wordcount-shaped aggregate, checkpointed); each round is
  * then a SINGLE corpus pass — margins evaluate in the scan against
  * the weight vector carried as a literal array (the broadcast-
  * equivalent for a model that is (nBuckets+1) longs), misclassified
  * docs explode their features into a map-side-combined per-bucket
  * sum of ≤ nBuckets+1 rows. The weight state lives on the driver
  * between rounds — the documented bounded-artifact convention
  * (PageRank's node count, q171's d²/2 Gram cells): O(nBuckets) per
  * round, never corpus-sized. A model too wide for a plan literal
  * (millions of hashed buckets) would swap the literal for a
  * broadcast join on `b` — same dataflow, same update rule.
  */
object Perceptron {

  /** Train `iters` batch-perceptron rounds over
    * `feats(doc_id, y, b, x)` — y ∈ {+1,−1}, b ∈ [0, nBuckets]
    * (bucket `nBuckets` is the caller's bias feature), x an integer
    * count. Returns `(b, w)`, one row per bucket, zero-initialized
    * buckets included even when no document touches them. */
  def train(feats: DataFrame, nBuckets: Int, iters: Int,
            localSolveMaxDocs: Long = 2000000L): DataFrame = {
    val spark = feats.sparkSession
    import spark.implicits._
    // one array-pair row per doc, materialized once: every round
    // re-reads this, never the raw feature stream. array_sort on the
    // (b, x) struct pins the collect_list order (b is unique per doc).
    val fa = feats.groupBy(col("doc_id"), col("y"))
      .agg(array_sort(collect_list(struct(col("b"), col("x")))).as("fx"))
      .select(col("y"),
        transform(col("fx"), s => s.getField("b")).as("bs"),
        transform(col("fx"), s => s.getField("x")).as("xs"))
      .localCheckpoint()
    // Hybrid switch (the ClusterUnify/PageRank convention): the
    // per-doc feature table is already materialized, so its count is
    // one cheap job; below the threshold ALL rounds run in one
    // executor task with the identical integer update — above it,
    // the per-round corpus aggregate below is unchanged.
    if (fa.count() <= localSolveMaxDocs) {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("b",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("w",
          org.apache.spark.sql.types.LongType, nullable = false)))
      val rows = fa.coalesce(1).rdd.mapPartitions { it =>
        val docs = it.map { r =>
          (r.getLong(0), r.getSeq[Long](1).toArray, r.getSeq[Long](2).toArray)
        }.toArray
        val w = Array.fill(nBuckets + 1)(0L)
        for (_ <- 1 to iters) {
          val upd = Array.fill(nBuckets + 1)(0L)
          docs.foreach { case (y, bs, xs) =>
            var m = 0L
            var i = 0
            while (i < bs.length) { m += w(bs(i).toInt) * xs(i); i += 1 }
            if (y * m <= 0L) {
              i = 0
              while (i < bs.length) { upd(bs(i).toInt) += y * xs(i); i += 1 }
            }
          }
          var b = 0
          while (b <= nBuckets) { w(b) += upd(b); b += 1 }
        }
        (0 to nBuckets).iterator
          .map(b => org.apache.spark.sql.Row(b.toLong, w(b)))
      }
      // lazy-materialize the one-task result so downstream passes
      // (broadcast + sort) run the multi-round kernel once
      // (the LocalExact convention)
      return spark.createDataFrame(rows, schema)
        .localCheckpoint(eager = false)
    }
    val w = Array.fill(nBuckets + 1)(0L)
    for (_ <- 1 to iters) {
      val wlit = array(w.toSeq.map(lit): _*)
      val upd = fa
        .withColumn("m", aggregate(
          zip_with(col("bs"), col("xs"),
            (b, x) => element_at(wlit, (b + lit(1L)).cast(IntegerType)) * x),
          lit(0L), (acc, v) => acc + v))
        .filter(col("y") * col("m") <= 0)
        .select(col("y"), explode(arrays_zip(col("bs"), col("xs"))).as("p"))
        .groupBy(col("p.bs").as("b"))
        .agg(sum(col("y") * col("p.xs")).as("u"))
        .collect() // bounded artifact: ≤ nBuckets+1 rows per round
      upd.foreach(r => w(r.getLong(0).toInt) += r.getLong(1))
    }
    w.toSeq.zipWithIndex.map { case (v, b) => (b.toLong, v) }.toDF("b", "w")
  }
}
