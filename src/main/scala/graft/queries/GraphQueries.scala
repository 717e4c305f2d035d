package graft.queries

import graft.operators.PageRank
import graft.util.Tables
import org.apache.spark.sql.functions._

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
        val edges = ce.selectExpr("'c' AS srcType", "c AS srcKey",
            "'s' AS dstType", "sup AS dstKey")
          .unionAll(ce.selectExpr("'s' AS srcType", "sup AS srcKey",
            "'c' AS dstType", "c AS dstKey"))
        PageRank(edges, iters = 5)
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
             |ORDER BY node_type, node_key""".stripMargin))
  )
}
