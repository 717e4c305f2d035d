package graft.operators

import graft.functions.VectorFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-cosine near-duplicate detection — the vector analog of
  * MinHash dedup for training-data pipelines: random-hyperplane LSH
  * (sign of projection per plane → bucket key), then exact cosine
  * verification inside buckets only. No cross join at any point: the
  * only shuffle is the bucket equi-join, and buckets shrink
  * geometrically with the number of planes.
  *
  * Hyperplanes are taken from the corpus itself (first `nPlanes`
  * vectors by id) so the pipeline is fully deterministic and
  * reproducible by any SQL oracle — no RNG state to ship.
  */
object EmbeddingDedup {

  /** @return (id_a, id_b, cosine) pairs sharing a sign-bucket with
    *         cosine ≥ threshold; ids ordered a < b. */
  def apply(vectors: DataFrame, idCol: String, vecCol: String,
            nPlanes: Int, threshold: Double): DataFrame = {
    val planes = vectors.orderBy(col(idCol)).limit(nPlanes)
      .select(col(idCol).as("plane_id"), col(vecCol).as("plane_vec"))

    // bucket key: concatenated signs of the scaled-long projections,
    // bit order fixed by sorting on plane_id
    val signs = vectors
      .crossJoin(broadcast(planes))
      .withColumn("_sign",
        when(VectorFns.dotScaled(col(vecCol), col("plane_vec")) >= 0, lit("1"))
          .otherwise(lit("0")))
      .groupBy(col(idCol), col(vecCol))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("plane_id"), col("_sign")))),
        s => s.getField("_sign")), "").as("bucket"))

    val a = signs.select(col("bucket"), col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = signs.select(col("bucket"), col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.join(b, "bucket")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", VectorFns.cosine(col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
