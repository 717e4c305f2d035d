package graft.util

import graft.queries.Registry

/** Plan-quality audit: for every registry query, flag cartesian /
  * nested-loop joins (except the documented broadcast-NL cases) and
  * report exchange counts — the "is this the plan you'd want at
  * 100 TB" review loop. */
object PlanAudit {
  // queries where a broadcast nested-loop/cross join is the intended
  // physical shape (small broadcast side by construction)
  private val intendedCross = Set(
    "q26_cosine_topk",  // |Q|=10 broadcast × corpus — exact baseline
    "q27_ivf_topk",     // 10 centroids broadcast (assignment stage)
    "q43_brand_fuzzy",  // 5-brand whitelist broadcast
    "q47_embedding_neardup", // plane literals only; flag if a join appears
    "q69_range_join",   // 3-interval tier dim broadcast (range condition)
    "q76_tfidf_topterms", // 1-row doc-count scalar broadcast into every task
    "q78_int8_quant",   // |Q|=10 broadcast × corpus — q26's exact-baseline shape
    "q89_kmeans_step",  // k=8 centroid broadcast × corpus — Lloyd assignment
    "q91_quantile_sketch") // 1-row min/max bounds broadcast into the bin scan

  def main(args: Array[String]): Unit = {
    val spark = Tables.session("audit")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    var flagged = 0
    Registry.all.foreach { q =>
      try {
        val plan = q.run(spark, dir).queryExecution.executedPlan.toString
        val cartesian = plan.contains("CartesianProduct")
        val bnl = plan.contains("BroadcastNestedLoopJoin")
        val exchanges = "Exchange".r.findAllIn(plan).length
        val flag =
          if (cartesian) "CARTESIAN!"
          else if (bnl && !intendedCross(q.name)) "UNEXPECTED-BNL!"
          else ""
        if (flag.nonEmpty) flagged += 1
        println(f"${q.name}%-26s exchanges=$exchanges%-3d " +
          f"${if (bnl) "bnl" else ""}%-4s $flag")
      } catch {
        case e: Throwable => println(s"${q.name} PLANFAIL ${e.getMessage.take(80)}")
      }
    }
    println(s"flagged=$flagged")
    spark.stop()
  }
}
