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
    // Coincident-point pre-collapse: exactly co-located points (the
    // dominant duplicate mode in POI data) reduce to one graph node,
    // so the edge set stays linear instead of quadratic in stack depth
    // and propagation starts pre-converged within each stack. `_rep`
    // maps every point to its stack min-id — as a WINDOW over the
    // (lat, lon) partitioning (r15): the groupBy+join-back form paid
    // two extra exchanges of the full point set for the same mapping,
    // and the distinct below reuses the window's partitioning
    // (HashPartitioning(lat, lon) satisfies the wider clustering).
    val withRep = points.withColumn("_rep",
      min(col(idCol)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col(latCol), col(lonCol))))
    val ids = withRep.select(col("_rep"), col(latCol), col(lonCol)).distinct()

    val right = ids.select(col("_rep").as("_dst"),
      col(latCol).as("_rlat"), col(lonCol).as("_rlon"))
    val edges = GeoRadiusJoin(ids, right, latCol, lonCol, "_rlat", "_rlon", radiusKm)
      .filter(col("_rep") =!= col("_dst"))
      .select(col("_rep").as("_src"), col("_dst"))

    val labels = components(ids.select(col("_rep").as("_id")), edges, maxIters)
    // re-expand stack representatives to every original point; the
    // component label (min rep id) IS the min member id, since each
    // rep is already its stack's min.
    withRep.join(
      labels.select(col("_id").as("_rep"), col("_lbl").as("cluster_id")), "_rep")
      .drop("_rep")
  }

  /** Min-label connected components over an explicit edge list — the
    * graph kernel behind [[apply]], reusable for any pair-producing
    * operator (LSH near-dup pairs, fuzzy-match pairs, ...).
    *
    * @param nodes one column `_id`; every node appears in the output
    *              even when isolated (own singleton component).
    * @param edges columns `_src`, `_dst`. Propagation follows edge
    *              direction, so pass SYMMETRIC edges (both
    *              orientations) for undirected semantics.
    * @return `_id`, `_lbl` where `_lbl` = min reachable `_id`.
    */
  def components(nodes: DataFrame, edges0: DataFrame,
                 maxIters: Int = 25,
                 localSolveMaxEdges: Long = 500000L): DataFrame = {
    // the edge set is re-joined every round (and read again by the
    // local kernel): materialize it once. Lazy checkpoint instead of
    // persist (r15) — persist keeps lineage and was unpersisted before
    // the lazily-checkpointed kernel ran, so the kernel re-ran the
    // edge pipeline's final stage; checkpoint blocks survive until the
    // bench releases them, so the kernel reads blocks.
    val edges = edges0.localCheckpoint(eager = false)
    val edgeCount = edges.count()
    if (edgeCount == 0) {
      return nodes.select(col("_id"), col("_id").as("_lbl"))
    }

    // Hybrid algorithm switch (the GraphFrames/GraphX convention): a
    // post-threshold dup-pair graph is usually a few rows per
    // duplicate cluster, and O(log diameter) distributed rounds cost
    // more in per-stage scheduling than the whole graph. Below the
    // threshold — known for free from the count above — solve
    // exactly with ONE union-find task (an executor task over a
    // coalesced partition, not a driver collect); above it, fall
    // through to the pointer-jumping loop. NOTE: union-find is
    // direction-insensitive while pointer jumping follows edge
    // direction, so the two paths agree ONLY for symmetric edge
    // sets — which the docstring already requires of every caller
    // (for a lone directed edge b→a with b>a, union-find would
    // label b with a where pointer jumping leaves b alone). With
    // symmetric input the output is identical either way:
    // `_lbl` = min reachable id.
    if (edgeCount <= localSolveMaxEdges) {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        edges.schema("_src").copy(name = "_id"),
        edges.schema("_src").copy(name = "_lbl")))
      val lblRdd = edges.coalesce(1).rdd.mapPartitions { it =>
        val parent = new java.util.HashMap[Any, Any]()
        def find(x: Any): Any = {
          var r = x
          while (parent.get(r) != r) r = parent.get(r)
          var c = x // path compression
          while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
          r
        }
        def lt(a: Any, b: Any): Boolean =
          a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
        it.foreach { row =>
          val (a, b) = (row.get(0), row.get(1))
          if (!parent.containsKey(a)) parent.put(a, a)
          if (!parent.containsKey(b)) parent.put(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { // min id becomes the root
            if (lt(ra, rb)) parent.put(rb, ra) else parent.put(ra, rb)
          }
        }
        val out = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
        parent.keySet().forEach(k => out += org.apache.spark.sql.Row(k, find(k)))
        out.iterator
      }
      // lazy-materialize the one-task result (the LocalExact
      // convention): the first consumer runs the union-find kernel
      // once (recomputing only edges' final map stage from its
      // shuffle files — the cache is gone by then) and every later
      // pass reads the label blocks; eager was measured ~0.3 s worse
      // at sf0.1 (extra job barrier > the saved final-stage re-read)
      val labels = edges.sparkSession.createDataFrame(lblRdd, schema)
        .localCheckpoint(eager = false)
      return nodes.join(labels, Seq("_id"), "left")
        .select(col("_id"), coalesce(col("_lbl"), col("_id")).as("_lbl"))
    }

    // Iterate ONLY the edge-incident subgraph: a node with no edge can
    // never leave its singleton label, so the loop runs over the
    // active vertices (dup-cluster members — orders of magnitude fewer
    // than the corpus at production scale) and every other node is
    // emitted as its own component by the final left-join. Round 1 is
    // FUSED into the initialization: with symmetric edges every active
    // vertex appears as a _dst, so one groupBy yields both the active
    // set and its round-1 neighbor-min (self-labels make the jump step
    // a no-op in round 1, so this is exactly the old first round —
    // which always changes ≥1 label when edges exist, so its
    // convergence check is safely skipped).
    //
    // localCheckpoint per round truncates lineage — a persist/unpersist
    // chain would leave each round's cache depending on the previous
    // (just-dropped) one and replay the whole iteration history on any
    // later action.
    var labels = edges.groupBy(col("_dst"))
      .agg(min(col("_src")).as("_m"))
      .select(col("_dst").as("_id"),
        least(col("_dst"), col("_m")).as("_lbl"))
      .localCheckpoint()
    var iter = 1
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
    nodes.join(labels, Seq("_id"), "left")
      .select(col("_id"), coalesce(col("_lbl"), col("_id")).as("_lbl"))
  }
}
