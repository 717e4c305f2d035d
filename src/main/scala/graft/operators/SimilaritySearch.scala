package graft.operators

import graft.functions.VectorFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column —
  * the RAG/top-k surface the reference declares against pgvector
  * (reference: src/shared/schemas.py:88-108, vector_store.py:85).
  *
  * Two access paths:
  *  - `bruteForceTopK`: queries × corpus via broadcast of the (small)
  *    query set, exact cosine, per-query window top-k. Correct
  *    baseline; cost O(|Q|·|C|) but fully parallel and |Q| is small in
  *    the RAG pattern.
  *  - `ivfTopK`: IVF-style two-stage search — k-means-ish centroid
  *    assignment via deterministic seed centroids, probe the nProbe
  *    nearest cells only. Cuts the scan to nProbe/nCells of the corpus;
  *    the scale path for 100 TB corpora (cell id becomes a partition
  *    key so a probe touches only matching partitions).
  */
object SimilaritySearch {

  /** Exact cosine top-k per query. `queries` is expected to be small
    * (broadcast); corpus arbitrary. Deterministic tie-break on corpus
    * id. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     qId: String, qVec: String, cId: String, cVec: String,
                     k: Int): DataFrame = {
    val joined = broadcast(queries.select(col(qId), col(qVec)))
      .crossJoin(corpus.select(col(cId), col(cVec)))
      .filter(col(qId) =!= col(cId))
      .withColumn("cosine", VectorFns.cosine(col(qVec), col(cVec)))
    val w = Window.partitionBy(col(qId))
      .orderBy(col("cosine").desc, col(cId))
    joined.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(qId), col(cId), col("cosine"), col("rnk"))
  }

  /** Assign every corpus vector to its nearest of `centroids` (small,
    * broadcast); returns corpus + `cell` column. Centroids: (cellId,
    * vector). Used both at index build and at query time. */
  def assignCells(vectors: DataFrame, centroids: DataFrame,
                  vId: String, vVec: String): DataFrame = {
    val assigned = vectors
      .crossJoin(broadcast(centroids.select(col("cell_id"), col("cell_vec"))))
      .withColumn("_d", VectorFns.l2SqScaled(col(vVec), col("cell_vec")))
    val w = Window.partitionBy(col(vId)).orderBy(col("_d"), col("cell_id"))
    assigned.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_d", "_rn", "cell_vec")
  }

  /** IVF top-k: probe only the `nProbe` cells nearest each query. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
              qId: String, qVec: String, cId: String, cVec: String,
              k: Int, nProbe: Int): DataFrame = {
    val indexed = assignCells(corpus, centroids, cId, cVec)
      .withColumnRenamed("cell_id", "cell")
    val qCells = queries
      .crossJoin(broadcast(centroids))
      .withColumn("_d", VectorFns.l2SqScaled(col(qVec), col("cell_vec")))
    val wq = Window.partitionBy(col(qId)).orderBy(col("_d"), col("cell_id"))
    val probes = qCells.withColumn("_rn", row_number().over(wq))
      .filter(col("_rn") <= nProbe)
      .select(col(qId), col(qVec), col("cell_id").as("cell"))
    val cand = probes.join(indexed, "cell")
      .filter(col(qId) =!= col(cId))
      .withColumn("cosine", VectorFns.cosine(col(qVec), col(cVec)))
    val w = Window.partitionBy(col(qId)).orderBy(col("cosine").desc, col(cId))
    cand.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(qId), col(cId), col("cosine"), col("rnk"))
  }
}
