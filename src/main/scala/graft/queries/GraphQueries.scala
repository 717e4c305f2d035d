package graft.queries

import graft.operators.PageRank
import graft.util.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Iterative-graph surface: entity importance over the
  * customer⇄supplier bipartite graph derived from orders ⋈ lineitem —
  * the PageRank-style source-quality weighting a training-data
  * pipeline applies to provenance domains (reference surface: the
  * provider-trust ordering in src/api config; published method:
  * Brin & Page 1998; CommonCrawl ranks hosts the same way).
  */
object GraphQueries {

  val all: Seq[Q] = Seq(

    // Fixed-iteration PageRank, integer-exact (see operators/PageRank).
    // The DuckDB oracle replays the identical power iteration as a
    // recursive CTE: each step is one aggregate over the previous
    // iteration's working table (single recursive reference — the
    // symmetrized edge set guarantees every node receives an edge, so
    // the join-aggregate regenerates the full node set each step).
    Q("q106_pagerank",
      (s, dir) => {
        val orders = Tables(s, dir, "orders")
        val lineitem = Tables(s, dir, "lineitem")
        val ce = orders.join(lineitem,
            orders("o_orderkey") === lineitem("l_orderkey"))
          .select(col("o_custkey").as("c"), col("l_suppkey").as("sup"))
          .distinct()
          // eager: the symmetrizing union below consumes ce in BOTH
          // branches of one plan — without the barrier the
          // orders⋈lineitem distinct (the query's heaviest stage)
          // executes twice inside PageRank's edge materialization.
          // This is the ONLY barrier under the edge set:
          // edgesMaterialized=true tells PageRank not to stack a
          // second checkpoint on what is now a cheap lazy union over
          // this RDD (the double barrier read +1.8 s in the r10
          // driver window)
          .localCheckpoint()
        val edges = ce.selectExpr("'c' AS srcType", "c AS srcKey",
            "'s' AS dstType", "sup AS dstKey")
          .unionAll(ce.selectExpr("'s' AS srcType", "sup AS srcKey",
            "'c' AS dstType", "c AS dstKey"))
        PageRank(edges, iters = 5, edgesMaterialized = true)
          .orderBy(col("node_type"), col("node_key"))
      },
      Some("""WITH RECURSIVE
             |ce AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS sup
             |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
             |edges AS (SELECT 'c' AS st, c AS sk, 's' AS dt, sup AS dk FROM ce
             |  UNION ALL SELECT 's', sup, 'c', c FROM ce),
             |deg AS (SELECT st, sk, CAST(COUNT(*) AS BIGINT) AS outdeg
             |  FROM edges GROUP BY st, sk),
             |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
             |t(iter, nt, nk, outdeg, score) AS (
             |  SELECT 0, st, sk, outdeg, 1000000000000 // n
             |  FROM deg CROSS JOIN nn
             |  UNION ALL
             |  SELECT t.iter + 1, e.dt, e.dk, d2.outdeg,
             |    (15 * (1000000000000 // nn.n)) // 100
             |      + (85 * SUM(t.score // t.outdeg)) // 100
             |  FROM t
             |  JOIN edges e ON e.st = t.nt AND e.sk = t.nk
             |  JOIN deg d2 ON d2.st = e.dt AND d2.sk = e.dk
             |  CROSS JOIN nn
             |  WHERE t.iter < 5
             |  GROUP BY t.iter, e.dt, e.dk, d2.outdeg, nn.n)
             |SELECT nt AS node_type, nk AS node_key, score
             |FROM t WHERE iter = 5
             |ORDER BY node_type, node_key""".stripMargin)),

    // Per-node triangle counts over the part co-purchase graph (parts
    // appearing in the same order), by DEGREE-ORIENTED wedge join —
    // the MapReduce-era trick (Suri & Vassilvitskii 2011, "Counting
    // Triangles and the Curse of the Last Reducer"): orient every
    // undirected edge from its (degree, id)-smaller endpoint, so each
    // triangle is emitted exactly once at its lowest-degree pivot and
    // per-node wedge work is bounded by out-degree² ≤ O(m) total
    // (out-degree ≤ O(√m) after orientation) instead of the hub's
    // degree² — the skew guard that makes the plan survive a
    // power-law graph at 100 TB. All stages are equi-joins on node
    // keys (shuffle-partitionable); no all-pairs, no driver state.
    // The DuckDB oracle enumerates each triangle once by the simpler
    // id-ordered three-way join — a different (skew-unsafe) plan that
    // proves the same answer.
    Q("q115_triangle_count",
      (s, dir) => {
        // graph = co-purchases within a deterministic quarter of the
        // orders (key-hash sample, same predicate in the oracle): the
        // co-purchase graph is near-complete on this synthetic data,
        // and wedge volume grows with degree² — the sample keeps the
        // registry run seconds-sized while the 10× trial still
        // exercises the full algorithm at growing scale
        // per-order part sets in ONE map-side-combined aggregate (the
        // q133 in-array discipline): collect_set dedups (ok, pk)
        // inside the aggregate, and the double explode generates each
        // order's pairs map-only — 2 shuffles (groupBy ok + pair
        // distinct) where the old distinct→self-join→distinct paid 3
        val e = Tables(s, dir, "lineitem")
          .filter(col("l_orderkey") % 4 === 0)
          .groupBy(col("l_orderkey").as("ok"))
          .agg(collect_set(col("l_partkey")).as("arr"))
          .select(explode(col("arr")).as("u"), col("arr"))
          .select(col("u"), explode(col("arr")).as("v"))
          .filter(col("u") < col("v"))
          .select(col("u"), col("v"))
          .distinct()
          // lazy: perNode's hybrid-switch count is the first consumer
          // and materializes it — one job instead of barrier + count
          .localCheckpoint(eager = false)
        // degree-oriented wedge join / single-task hybrid — see
        // operators/TriangleCount
        graft.operators.TriangleCount.perNode(e)
          .orderBy(col("node"))
      },
      Some("""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
             |  FROM lineitem WHERE l_orderkey % 4 = 0),
             |e AS (SELECT DISTINCT a.pk AS u, b.pk AS v
             |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
             |t AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
             |  FROM e e1
             |  JOIN e e2 ON e1.v = e2.u
             |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
             |n AS (SELECT a AS node FROM t
             |  UNION ALL SELECT b FROM t
             |  UNION ALL SELECT c FROM t)
             |SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles
             |FROM n GROUP BY node ORDER BY node""".stripMargin))
  )
}
