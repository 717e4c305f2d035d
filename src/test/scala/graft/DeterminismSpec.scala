package graft

/** Run-to-run determinism pin for the queries that were driver-red on
  * hash-only compares in rounds 7–8 (root cause: DuckDB HUGEINT
  * widening in the oracle, fixed in round 9 — scripts/check.py's
  * TYPEWIDE guard). This spec closes the other conceivable cause:
  * execute each query TWICE in one session and require bit-identical
  * row sets, so any nondeterminism in the distributed plan (partial
  * aggregation order, top-k ties, prefix-sum offsets) fails CI
  * directly rather than surfacing as an unexplained driver hash
  * mismatch. */
class DeterminismSpec extends SparkSpec {

  private def rows(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, sf001)
    df.collect().map(_.toString).toSeq
  }

  Seq("q99_dsir_select", "q122_decile_bins", "q106_pagerank",
    "q23_jaccard_verify", "q155_rfm_segments").foreach { q =>
    test(s"$q is bit-identical across two executions") {
      val a = rows(q)
      val b = rows(q)
      assert(a == b, s"$q diverged between runs")
      assert(a.nonEmpty)
    }
  }
}
