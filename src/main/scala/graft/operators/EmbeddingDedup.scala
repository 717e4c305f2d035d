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
  * reproducible by any SQL oracle — no RNG state to ship. The planes
  * are collected to the driver (nPlanes rows — bounded and tiny, like
  * any LSH plane set) and inlined as literals, so bucketing is a pure
  * projection: no extra join or shuffle to attach signs.
  */
object EmbeddingDedup {

  /** @return (id_a, id_b, cosine) pairs sharing a sign-bucket with
    *         cosine ≥ threshold; ids ordered a < b.
    *
    * `maxBucket` skew guard: a corpus with many identical vectors puts
    * them all in one sign-bucket; buckets above the cap emit STAR
    * pairs (member vs min-id hub) instead of all pairs — identical
    * vectors still pair at cosine 1 with the hub, and candidate count
    * stays O(bucket) instead of O(bucket²). Recall trade as in
    * [[Dedup.minhashCandidates]]: member-member edges inside a hot
    * bucket surface only through the hub, so size the cap above any
    * bucket an all-pairs pass should handle. */
  def apply(vectors: DataFrame, idCol: String, vecCol: String,
            nPlanes: Int, threshold: Double, maxBucket: Int = 1000): DataFrame = {
    val planeVecs: Seq[Seq[Float]] = vectors.orderBy(col(idCol)).limit(nPlanes)
      .select(col(vecCol)).collect().toSeq
      .map(_.getSeq[Float](0))

    // bucket key: concatenated projection signs, plane order = id order
    val bucket = concat(planeVecs.map { p =>
      when(VectorFns.dotScaled(col(vecCol), typedLit(p)) >= 0, lit("1"))
        .otherwise(lit("0"))
    }: _*)

    // materialize once: the nPlanes+1 scaled-dot projections feed the
    // bucket aggregate, both cold self-join sides, and the star branch
    // — same reason Dedup's kernels checkpoint their fingerprint scans
    val signs = vectors.select(col(idCol), col(vecCol),
        VectorFns.normSqScaled(col(vecCol)).as("_n"), bucket.as("bucket"))
      .localCheckpoint()

    // one hash aggregate carries bucket size + min-id hub; its bucket
    // exchange is the same one the self-join needs (no window sort)
    val bucketInfo = signs.groupBy(col("bucket"))
      .agg(count(lit(1)).as("_bn"),
        min_by(struct(col(idCol).as("id"), col(vecCol).as("vec"),
          col("_n").as("n")), col(idCol)).as("_hub"))
    val enriched = signs.join(bucketInfo, "bucket")
    val cold = enriched.filter(col("_bn") <= maxBucket)
    val a = cold.select(col("bucket"), col(idCol).as("id_a"),
      col(vecCol).as("vec_a"), col("_n").as("_na"))
    val b = cold.select(col("bucket"), col(idCol).as("id_b"),
      col(vecCol).as("vec_b"), col("_n").as("_nb"))
    val coldPairs = a.join(b, "bucket")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        col("vec_a"), col("vec_b"), col("_na"), col("_nb"))
    val starPairs = enriched
      .filter(col("_bn") > maxBucket && col(idCol) =!= col("_hub.id"))
      .select(col("_hub.id").as("id_a"), col(idCol).as("id_b"),
        col("_hub.vec").as("vec_a"), col(vecCol).as("vec_b"),
        col("_hub.n").as("_na"), col("_n").as("_nb"))
    coldPairs.unionByName(starPairs)
      .withColumn("cosine",
        when(col("_na") === 0 || col("_nb") === 0, lit(null).cast("double"))
          .otherwise(VectorFns.dotScaled(col("vec_a"), col("vec_b")).cast("double") /
            sqrt(col("_na").cast("double") * col("_nb").cast("double"))))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
