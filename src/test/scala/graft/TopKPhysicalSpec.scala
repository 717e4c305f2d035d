package graft

import graft.plans.TopKPhysical
import org.apache.spark.sql.functions._

class TopKPhysicalSpec extends SparkSpec {

  test("custom physical top-k equals the window formulation exactly") {
    val orders = graft.util.Tables(spark, sf001, "orders")
    val viaExec = TopKPhysical.topK(orders,
      groupBy = Seq("o_custkey"),
      orderBy = Seq(("o_totalprice", false), ("o_orderkey", true)), k = 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
      .orderBy("o_custkey", "rnk")
    val viaWindow = graft.operators.TopKPerGroup(orders,
      Seq(col("o_custkey")), Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
      .orderBy("o_custkey", "rnk")
    val a = viaExec.collect().toSeq
    val b = viaWindow.collect().toSeq
    assert(a.size == b.size && a.zip(b).forall { case (x, y) =>
      x.getLong(0) == y.getLong(0) && x.getLong(1) == y.getLong(1) &&
        x.getDouble(2) == y.getDouble(2) && x.getInt(3) == y.getInt(3)
    })
    // physical plan actually uses the custom operator + one exchange
    val plan = viaExec.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroupExec") || plan.contains("TopKPerGroup"),
      s"custom exec missing:\n$plan")
    // ... and the map-side partial pass sits BELOW the exchange, so a
    // group's raw input is reduced to <=k rows per partition before any
    // shuffle (the final pass above the exchange merges candidates)
    assert(plan.contains("PartialTopK"), s"partial pass missing:\n$plan")
    val exchangeIdx = plan.indexOf("Exchange")
    val partialIdx = plan.indexOf("PartialTopK")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"partial pass must be under the exchange:\n$plan")
  }

  test("partial pass caps what each input partition can ship per group") {
    import spark.implicits._
    // 8 input partitions, ONE group, 10k rows: the partial phase may
    // emit at most k rows per (partition, group) = 8*3 candidates into
    // the exchange; the final phase must still produce the exact top-3
    val big = spark.sparkContext.parallelize(1 to 10000, 8)
      .map(i => (1L, i.toLong)).toDF("g", "v")
    val out = TopKPhysical.topK(big, Seq("g"), Seq(("v", false)), 3)
      .select("v", "rnk").as[(Long, Int)].collect().sortBy(_._2)
    assert(out.map(_._1).toSeq == Seq(10000L, 9999L, 9998L))
    // count rows flowing out of the partial pass directly (sparkPlan:
    // the pre-AQE tree, traversable and executable below the exchange)
    val partialOnly = graft.plans.TopKPhysical.topK(big, Seq("g"),
      Seq(("v", false)), 3).queryExecution.sparkPlan
      .collectFirst { case p: graft.plans.PartialTopKExec => p }
    assert(partialOnly.isDefined)
    val shipped = partialOnly.get.execute().count()
    assert(shipped <= 8L * 3, s"partial shipped $shipped rows, expected <=24")
  }

  test("pre-clustered input: partial pass preserves partitioning, no extra exchange") {
    val orders = graft.util.Tables(spark, sf001, "orders")
      .repartition(col("o_custkey"))
    val df = TopKPhysical.topK(orders, Seq("o_custkey"),
      Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
    val plan = df.queryExecution.executedPlan.toString
    // exactly ONE exchange — the explicit repartition; the top-k's
    // final pass reuses that clustering instead of re-shuffling
    assert("Exchange".r.findAllIn(plan).length == 1, s"extra exchange:\n$plan")
    assert(df.count() > 0)
  }

  test("bounded buffers survive groups far larger than the trim threshold") {
    import spark.implicits._
    // one group with 10k rows — forces many trim cycles
    val big = (1 to 10000).map(i => (1L, i.toLong)).toDF("g", "v")
    val out = TopKPhysical.topK(big, Seq("g"), Seq(("v", false)), 5)
      .select("v", "rnk").as[(Long, Int)].collect().sortBy(_._2)
    assert(out.map(_._1).toSeq == Seq(10000L, 9999L, 9998L, 9997L, 9996L))
  }

  test("row budget triggers global trims under high group cardinality") {
    import spark.implicits._
    spark.conf.set("spark.graft.topk.maxBufferedRows", "1000")
    try {
      // 200k distinct groups × 3 rows with per-group buffers that would
      // hold 3 rows each (below trimAt) — without the global trim the
      // map retains all 600k rows; with it each buffer collapses to
      // k=1 as soon as a task crosses 1000 buffered rows
      val big = (0 until 600000).map(i => (i % 200000L, i.toLong))
        .toDF("g", "v")
      val out = TopKPhysical.topK(big, Seq("g"), Seq(("v", false)), 1)
        .select("g", "v").as[(Long, Long)].collect()
      assert(out.length == 200000)
      // top row per group g is v = g + 400000 (the largest of the 3)
      assert(out.forall { case (g, v) => v == g + 400000L })
    } finally spark.conf.unset("spark.graft.topk.maxBufferedRows")
  }

  test("every topK registry caller is partition-invariant (tie-break convention)") {
    // The partial/final split is exact only under a TOTAL per-group
    // order (topK's documented contract): a caller omitting a unique
    // tie-break would get partitioning-dependent tied survivors. Pin
    // the convention BEHAVIORALLY: run each registry query that routes
    // through TopKPhysical.topK under two very different scan-split +
    // shuffle-partition settings and require identical results.
    val topKQueries = Seq("q26_cosine_topk", "q27_ivf_topk",
      "q28b_rag_filtered", "q58_topk_physical", "q72_balanced_sample",
      "q78_int8_quant")
    def withConf(pairs: (String, String)*)(body: => Seq[String]): Seq[String] = {
      val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body
      finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
    topKQueries.foreach { name =>
      val q = graft.queries.Registry.byName(name)
      def canon(): Seq[String] = q.run(spark, sf001).collect().map(_.toString).toSeq
      val tiny = withConf(
        "spark.sql.files.maxPartitionBytes" -> "65536",
        "spark.sql.files.openCostInBytes" -> "0",
        "spark.sql.shuffle.partitions" -> "3")(canon())
      val wide = withConf(
        "spark.sql.shuffle.partitions" -> "13")(canon())
      assert(tiny == wide, s"$name is partitioning-dependent")
    }
  }
}
