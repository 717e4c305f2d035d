package graft.operators

import graft.functions.VectorFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** SemDeDup-style semantic deduplication — cluster-then-dedup over an
  * embedding column (Abbas et al., "SemDeDup: Data-efficient learning
  * at web-scale through semantic deduplication", arXiv:2303.09540 —
  * published method): assign every vector to its nearest centroid,
  * generate candidate pairs ONLY within a cell, and drop every vector
  * that has a near-duplicate with a smaller id in its cell (the
  * deterministic "keep the cluster-minimum representative" rule — no
  * iteration, SQL-oracle-replayable).
  *
  * This is the missing middle ground between exact-cosine all-pairs
  * (O(N²), dead at corpus scale) and hyperplane-LSH near-dup
  * ([[EmbeddingDedup]], recall limited by bucket granularity): cell
  * assignment reuses the IVF machinery ([[SimilaritySearch.assignCells]]
  * — min_by aggregate, no window), and pair work is Σ|cell|² with
  * cells ~ N/√N, a ~√N-factor reduction versus all-pairs. Hot cells
  * (a degenerate corpus putting everything in one cell) go through
  * the same star-cap as every dedup operator in the family —
  * [[Dedup.starCappedPairs]] caps a cell's pair count at O(|cell|)
  * around its min-id hub, so one hot key cannot quadratically explode
  * a task.
  *
  * Same exact scaled-long cosine as the rest of the vector surface, so
  * results are partition-invariant and bit-reproducible by the DuckDB
  * oracle.
  *
  * @return one row per input vector: (id, cell_id, kept 1|0)
  */
object SemanticDedup {

  /** @param strictCap oracle-verified callers (q97, q103) pass true:
    *   if any cell exceeds `maxCell`, the star-cap would silently
    *   drop only the hub's near-dups — a divergence from the stated
    *   "any smaller-id near-dup" rule that no oracle can see — so
    *   fail loudly naming the hot cell instead. Pass false only for
    *   best-effort dedup where capped recall is acceptable. */
  def apply(vectors: DataFrame, idCol: String, vecCol: String,
            centroids: DataFrame, threshold: Double,
            maxCell: Int = 1000, strictCap: Boolean = true): DataFrame = {
    val assigned = SimilaritySearch.assignCells(
      vectors.select(col(idCol), col(vecCol)), centroids, idCol, vecCol)
    // materialize once: the assignment pipeline feeds BOTH the pair
    // generator and the final kept-flag join — without this the
    // |corpus|×nCells argmin runs twice
    val banded = assigned.select(col("cell_id"),
        col(idCol).as("id"), col(vecCol).as("vec"),
        VectorFns.normSqScaled(col(vecCol)).as("_n"))
      .localCheckpoint()
    if (strictCap) {
      // one tiny aggregate over the already-materialized checkpoint
      val hot = banded.groupBy(col("cell_id")).agg(count(lit(1)).as("n"))
        .filter(col("n") > maxCell)
        .orderBy(col("n").desc, col("cell_id")).limit(1).collect()
      if (hot.nonEmpty) throw new IllegalStateException(
        s"SemanticDedup: cell ${hot(0).get(0)} holds ${hot(0).getLong(1)} " +
          s"vectors > maxCell=$maxCell — the star-cap would silently " +
          "diverge from the all-pairs rule; raise maxCell, train more " +
          "centroids, or opt into capped recall with strictCap=false")
    }
    val pairs = Dedup.starCappedPairs(banded, Seq("cell_id"), Seq("vec", "_n"), maxCell)
      .withColumn("cosine",
        when(col("_n_a") === 0 || col("_n_b") === 0, lit(null).cast(DoubleType))
          .otherwise(VectorFns.dotScaled(col("vec_a"), col("vec_b")).cast(DoubleType) /
            sqrt(col("_n_a").cast(DoubleType) * col("_n_b").cast(DoubleType))))
    val dropped = pairs.filter(col("cosine") >= threshold)
      .select(col("id_b").as("id")).distinct()
    banded.select(col("id"), col("cell_id"))
      .join(dropped.withColumn("_d", lit(1)), Seq("id"), "left")
      .select(col("id"), col("cell_id"),
        when(col("_d").isNull, lit(1)).otherwise(lit(0)).as("kept"))
  }
}
