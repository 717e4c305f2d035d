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
  *  2. min-label propagation with POINTER JUMPING: each round a node
  *     takes min(own label, neighbors' labels, label-of-its-label).
  *     The jump step doubles the propagation horizon, so rounds are
  *     O(log diameter) — the hash-join formulation of the
  *     large-star/small-star MapReduce algorithm. One shuffle set and
  *     ONE driver action (the combined materialize+changed count) per
  *     round. Cluster id = min member id — the deterministic
  *     tie-breaker SURVEY §7.4 calls for.
  */
object ClusterUnify extends org.apache.spark.internal.Logging {

  /** @return input rows + `cluster_id` (min id reachable via chains of
    *         pairwise distance ≤ radiusKm). */
  def apply(points: DataFrame, idCol: String, latCol: String, lonCol: String,
            radiusKm: Double, maxIters: Int = 25): DataFrame = {
    val ids = points.select(col(idCol), col(latCol), col(lonCol))

    val right = ids.select(col(idCol).as("_dst"),
      col(latCol).as("_rlat"), col(lonCol).as("_rlon"))
    val edges = GeoRadiusJoin(ids, right, latCol, lonCol, "_rlat", "_rlon", radiusKm)
      .filter(col(idCol) =!= col("_dst"))
      .select(col(idCol).as("_src"), col("_dst"))
      .persist()
    edges.count()

    // localCheckpoint per round truncates lineage — a persist/unpersist
    // chain would leave each round's cache depending on the previous
    // (just-dropped) one and replay the whole iteration history on any
    // later action.
    var labels = ids.select(col(idCol).as("_id"), col(idCol).as("_lbl"))
      .localCheckpoint()
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIters) {
      val t0 = System.nanoTime()
      val viaNeighbors = edges
        .join(labels.select(col("_id").as("_src"), col("_lbl").as("_nl")), "_src")
        .groupBy(col("_dst").as("_id"))
        .agg(min(col("_nl")).as("_minn"))
      // pointer jump: the label my current label points to
      val jumped = labels.select(col("_id").as("_jid"), col("_lbl").as("_jl"))
      val next = labels
        .join(viaNeighbors, Seq("_id"), "left")
        .join(jumped.withColumnRenamed("_jid", "_lbl"), Seq("_lbl"), "left")
        .select(col("_id"),
          least(col("_lbl"), coalesce(col("_minn"), col("_lbl")),
            coalesce(col("_jl"), col("_lbl"))).as("_lbl"),
          (least(col("_lbl"), coalesce(col("_minn"), col("_lbl")),
            coalesce(col("_jl"), col("_lbl"))) < col("_lbl")).as("_chg"))
        .localCheckpoint() // eager: materializes this round once
      changed = next.filter(col("_chg")).count()
      labels = next.select(col("_id"), col("_lbl"))
      iter += 1
      logInfo(s"cluster-unify round $iter: changed=$changed " +
        f"(${(System.nanoTime() - t0) / 1e9}%.2fs)")
    }
    edges.unpersist()
    points.join(
      labels.select(col("_id").as(idCol), col("_lbl").as("cluster_id")), idCol)
  }
}
