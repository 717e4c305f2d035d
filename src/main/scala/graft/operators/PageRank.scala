package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Fixed-iteration PageRank (power method, Brin & Page 1998) over an
  * edge table — entity-importance scoring, the graph-quality signal a
  * training-data pipeline uses to weight sources (harmonic-centrality /
  * PageRank source weighting a la CommonCrawl) and the third member of
  * the engine's iterative-graph family next to pointer-jumping CC
  * ([[ClusterUnify]]) and Lloyd k-means ([[KMeansTrain]]).
  *
  * Deterministic by construction so a DuckDB recursive CTE replays it
  * bit-for-bit (q106):
  *   - every score is a scaled BIGINT (`scale` = 1e12); sums of longs
  *     are order-independent, so partial aggregation can't wobble the
  *     result — no doubles anywhere;
  *   - per-edge contribution is `score DIV outdeg` (truncating
  *     non-negative integer division, identical to DuckDB's `//`);
  *   - the damping mix is integer: `(15 * base) DIV 100 +
  *     (85 * inc) DIV 100`.
  *
  * Scale shape: the edge set is materialized ONCE (with the
  * destination's outdeg attached, so no per-iteration degree join)
  * and pre-partitioned on the source key — each iteration then
  * shuffles only the node-sized state into the join, followed by a
  * map-side-combined SUM per destination: the Pregel message
  * exchange, with the big relation stationary. State is
  * `localCheckpoint`ed so lineage stays flat (the KMeansTrain
  * convention). Every node must appear as a destination (true for
  * any symmetrized edge set — callers passing a directed graph
  * should union the reverse edges or accept dangling-node drop-out).
  */
object PageRank {

  /** Run `iters` power iterations over `edges(srcType, srcKey,
    * dstType, dstKey)` (typed keys let bipartite graphs share the
    * node space); returns `(node_type, node_key, score)`. */
  def apply(edges: DataFrame, iters: Int, scale: Long = 1000000000000L): DataFrame = {
    // materialize the (possibly expensive) caller-supplied edge
    // derivation ONCE — e feeds both deg and eAug, and without the
    // checkpoint its upstream plan (q106: an orders⋈lineitem distinct)
    // executes twice
    val e = edges.select(
      col("srcType").as("st"), col("srcKey").cast(LongType).as("sk"),
      col("dstType").as("dt"), col("dstKey").cast(LongType).as("dk"))
      .localCheckpoint()
    val deg = e.groupBy(col("st"), col("sk"))
      .agg(count(lit(1)).cast(LongType).as("outdeg"))
      .localCheckpoint()
    // node count as a one-row broadcast frame — keeps the base term
    // identical on every row without a driver-side action
    val nn = deg.agg(count(lit(1)).cast(LongType).as("n"))
    // materialize the iteration-invariant relation once: edges with
    // the DESTINATION's outdeg attached, so the next state's outdeg
    // needs no per-iteration join. No pre-partitioning: the iteration
    // joins broadcast the node-sized state into this stationary
    // relation, so an edge shuffle would be pure setup cost (callers
    // with an unbroadcastable node table should repartition on
    // (st, sk) here and drop the broadcast hint below).
    val eAug = e
      .join(deg.select(col("st").as("dt"), col("sk").as("dk"),
        col("outdeg").as("dst_outdeg")), Seq("dt", "dk"))
      .localCheckpoint()
    var state = deg.crossJoin(broadcast(nn))
      .selectExpr("st AS nt", "sk AS nk", "outdeg",
        s"CAST($scale AS BIGINT) DIV n AS score")
    for (_ <- 0 until iters) {
      // broadcast the node-sized state into the stationary edge
      // relation: no edge shuffle per iteration, only the
      // map-side-combined contribution aggregate. On a graph whose
      // node table outgrows the broadcast threshold, drop the hint —
      // the pre-partitioned eAug then takes a state-side-only shuffle
      // join (AQE picks the same split at runtime). The chain stays
      // LAZY across iterations: each state is consumed exactly once
      // (by the next iteration's broadcast), so nothing recomputes,
      // and fusing the bounded-depth chain into one job avoids an
      // eager materialization + driver action per iteration (5
      // per-iteration localCheckpoints cost ~2× wall-clock here;
      // eAug's checkpoint above is the one that matters — it is read
      // `iters` times).
      state = broadcast(state)
        .join(eAug, col("nt") === col("st") && col("nk") === col("sk"))
        .selectExpr("dt", "dk", "dst_outdeg", "score DIV outdeg AS c")
        .groupBy(col("dt"), col("dk"), col("dst_outdeg"))
        .agg(sum(col("c")).as("inc"))
        .crossJoin(broadcast(nn))
        .selectExpr("dt AS nt", "dk AS nk", "dst_outdeg AS outdeg",
          s"(15 * (CAST($scale AS BIGINT) DIV n)) DIV 100 + (85 * inc) DIV 100 AS score")
    }
    state.select(col("nt").as("node_type"), col("nk").as("node_key"), col("score"))
  }
}
