package graft

import graft.operators.PrefixSum
import org.apache.spark.sql.functions._

/** Two-phase distributed prefix sum: equals the sequential running
  * total for any partition count, including degenerate ones. */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  private def expected(rows: Seq[(Long, Long)]): Map[Long, Long] = {
    var acc = 0L
    rows.sortBy(_._1).map { case (k, v) => acc += v; k -> acc }.toMap
  }

  test("prefix sum equals sequential cumsum across partition counts") {
    val rng = new scala.util.Random(7)
    val rows = (0L until 1000L).map(i => i -> (rng.nextInt(100) - 20).toLong)
    val want = expected(rows)
    val df = rows.toDF("k", "v")
    for (n <- Seq(1, 3, 16, 64)) {
      val got = PrefixSum(df, "k", "v", numParts = n)
        .select(col("k"), col("cum")).as[(Long, Long)].collect().toMap
      assert(got == want, s"mismatch at numParts=$n")
    }
  }

  test("more partitions than rows (empty range partitions) still sums") {
    val rows = Seq(10L -> 5L, 20L -> -3L, 30L -> 7L, 40L -> 1L, 50L -> 2L)
    val got = PrefixSum(rows.toDF("k", "v"), "k", "v", numParts = 64)
      .select(col("k"), col("cum")).as[(Long, Long)].collect().toMap
    assert(got == expected(rows))
  }

  test("grouped prefix sum equals one apply() per group") {
    val rng = new scala.util.Random(11)
    val rows = for {
      g <- Seq("a", "b", "c")
      i <- 0L until 400L
    } yield (g, i, (rng.nextInt(100) - 20).toLong)
    val perGroup: Map[(String, Long), Long] = rows.groupBy(_._1).flatMap {
      case (g, rs) =>
        var acc = 0L
        rs.sortBy(_._2).map { case (_, k, v) => acc += v; (g, k) -> acc }
    }
    val df = rows.toDF("g", "k", "v")
    for (n <- Seq(1, 3, 16, 64)) {
      val got = PrefixSum.grouped(df, "g", "k", "v", numParts = n)
        .select(col("g"), col("k"), col("cum"))
        .as[(String, Long, Long)].collect()
        .map { case (g, k, c) => (g, k) -> c }.toMap
      assert(got == perGroup, s"grouped mismatch at numParts=$n")
    }
  }

  test("offsets frame is bounded by partition count, not rows") {
    // the only non-parallel step must be the numParts-row window; the
    // data-sized stages keep the requested parallelism
    val df = (0L until 500L).map(i => i -> i).toDF("k", "v")
    val plan = PrefixSum(df, "k", "v", numParts = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastQueryStage"),
      s"offsets not broadcast:\n$plan")
  }
}
