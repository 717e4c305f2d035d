package graft.operators

import graft.functions.GeoFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spatial cluster unification (connected components over a
  * within-distance graph) — the reference's buffer(10 m) → dissolve →
  * explode → sjoin pipeline (reference: src/ETL_POIS/process_pois.py:
  * 396-426), which is transitive: A-B at 15 m and B-C at 15 m merge
  * A,B,C even when A-C > 20 m (SURVEY §7.4).
  *
  * Distributed form:
  *  1. build the within-radius edge set with [[GeoRadiusJoin]] (grid
  *     cell prefilter — no cross join);
  *  2. iterative min-label propagation over the edges until fixpoint
  *     (labels only decrease; converges in ≤ graph-diameter rounds,
  *     each round one shuffle). Cluster id = min member id — the
  *     deterministic tie-breaker SURVEY §7.4 calls for.
  *
  * At 100 TB scale swap step 2 for the alternating large-star/
  * small-star algorithm (Kiveris et al., "Connected Components in
  * MapReduce") — same join shape, O(log n) rounds; the simple
  * propagation is kept here because POI clusters are metres wide and
  * the graph diameter is tiny.
  */
object ClusterUnify {

  /** @return input rows + `cluster_id` (min id reachable via chains of
    *         pairwise distance ≤ radiusKm). */
  def apply(points: DataFrame, idCol: String, latCol: String, lonCol: String,
            radiusKm: Double, maxIters: Int = 50): DataFrame = {
    val ids = points.select(col(idCol), col(latCol), col(lonCol))

    // Edge set (undirected, no self edges needed — every node seeds
    // its own label). Both directions kept so propagation is symmetric.
    val right = ids.select(col(idCol).as("_dst"),
      col(latCol).as("_rlat"), col(lonCol).as("_rlon"))
    val edges = GeoRadiusJoin(ids, right, latCol, lonCol, "_rlat", "_rlon", radiusKm)
      .filter(col(idCol) =!= col("_dst"))
      .select(col(idCol).as("_src"), col("_dst"))
      .persist()

    var labels = ids.select(col(idCol).as("_id"), col(idCol).as("_lbl")).persist()
    var iter = 0
    var converged = edges.isEmpty
    while (!converged && iter < maxIters) {
      // candidate labels: own + min over neighbors' labels
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("_id", "_src").withColumnRenamed("_lbl", "_nl"), "_src")
        .groupBy(col("_dst").as("_id"))
        .agg(min(col("_nl")).as("_minn"))
      val next = labels.join(viaNeighbors, Seq("_id"), "left")
        .select(col("_id"), least(col("_lbl"), coalesce(col("_minn"), col("_lbl"))).as("_lbl"))
        .persist()
      next.count() // materialize before checking convergence
      val changed = next.join(labels.withColumnRenamed("_lbl", "_old"), "_id")
        .filter(col("_lbl") =!= col("_old")).limit(1).count() > 0
      labels.unpersist()
      labels = next
      converged = !changed
      iter += 1
    }
    edges.unpersist()
    points.join(
      labels.select(col("_id").as(idCol), col("_lbl").as("cluster_id")), idCol)
  }
}
