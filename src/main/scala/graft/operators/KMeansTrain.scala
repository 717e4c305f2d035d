package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions.VectorFns

/** K-means codebook TRAINING: the q89 Lloyd step composed to a fixed
  * iteration count — the trainer behind every centroid-consuming
  * operator in the vector family (IVF cells in
  * [[SimilaritySearch.ivfTopK]], PQ codebooks, SemDeDup cells in
  * [[SemanticDedup]]).
  *
  * Deterministic by construction, so the full training loop is
  * bit-reproducible by the DuckDB oracle (q103 replays it as a
  * recursive CTE):
  *   - init: the k min-id vectors (no RNG);
  *   - assignment: exact scaled-long L2 argmin via `min_by` with the
  *     (distance, cell_id) tie-break — map-side combine collapses each
  *     vector's k candidates inside the scan task, no window
  *     (see [[SimilaritySearch.assignCells]]);
  *   - recompute: per-dimension means accumulated as scaled longs
  *     (order-independent exact integer sums), divisions in a fixed
  *     order, rounded to 6 decimals — each iteration's centroids are
  *     exact decimal values both engines reproduce;
  *   - empty clusters keep their previous centroid (left join +
  *     coalesce), the standard Lloyd convention.
  *
  * Scale shape: centroids are k rows (broadcast); each iteration is
  * one |corpus|-row aggregate (assignment) + one |corpus|·dim-row
  * aggregate (means), both map-side combined — spark.ml KMeans'
  * dataflow with the nondeterminism removed. State between iterations
  * is k rows, `localCheckpoint`ed to keep lineage flat.
  *
  * Published method: Lloyd's algorithm; SemDeDup trains its cells
  * exactly this way (Abbas et al., arXiv:2303.09540 §2).
  */
object KMeansTrain {

  /** Train centroids over `vectors(idCol, vecCol)`; returns
    * `(cell_id: long, cell_vec: array<double>)`, one row per of the
    * `k` min-id-initialized centroids. */
  def train(vectors: DataFrame, idCol: String, vecCol: String,
            k: Int, iters: Int): DataFrame = {
    val vecs = vectors.select(col(idCol).cast(LongType).as("_vid"),
      col(vecCol).as("_v"))
    var cents = vecs.filter(col("_vid") < k)
      .select(col("_vid").as("cell_id"),
        transform(col("_v"), x => x.cast(DoubleType)).as("cell_vec"))
      .localCheckpoint()
    for (_ <- 0 until iters) {
      val assigned = vecs
        .crossJoin(broadcast(cents.select(col("cell_id").as("_cid"),
          col("cell_vec").as("_cv"))))
        .withColumn("_d", VectorFns.l2SqScaled(col("_v"), col("_cv")))
        .groupBy(col("_vid"))
        .agg(min_by(col("_cid"), struct(col("_d"), col("_cid"))).as("_cid"),
          first(col("_v")).as("_v"))
      val means = assigned
        .select(col("_cid"), posexplode(col("_v")).as(Seq("_dim", "_x")))
        .withColumn("_xs",
          round(col("_x").cast(DoubleType) * lit(1e10), 0).cast(LongType))
        .groupBy(col("_cid"), col("_dim"))
        .agg(count(lit(1)).as("_n"), sum(col("_xs")).as("_xsum"))
        .select(col("_cid"), col("_dim"),
          round(col("_xsum").cast(DoubleType) / col("_n").cast(DoubleType)
            / lit(1e10), 6).as("_cvd"))
        .groupBy(col("_cid"))
        // collect_list is order-nondeterministic; array_sort on the
        // (dim, value) struct restores the one true order
        .agg(transform(
          array_sort(collect_list(struct(col("_dim"), col("_cvd")))),
          s => s.getField("_cvd")).as("_nv"))
      cents = cents
        .join(means, cents("cell_id") === means("_cid"), "left")
        .select(col("cell_id"),
          coalesce(col("_nv"), col("cell_vec")).as("cell_vec"))
        .localCheckpoint()
    }
    cents
  }
}
