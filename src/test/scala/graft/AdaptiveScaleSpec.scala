package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** Runtime re-planning features the 100 TB deployment leans on, proven
  * at plan level: (1) runtime Bloom-filter injection prunes the probe
  * side of a selective join before the shuffle (Spark's runtime row
  * filtering — the engine-level equivalent of the reference's
  * pre-filtered batch queries); (2) AQE splits skewed join partitions
  * at runtime (the safety net under the explicit salting/star-fallback
  * guards the operators already carry).
  */
class AdaptiveScaleSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter prunes the big side of a selective join") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      // lowercase unit: "1B" does NOT parse as 1 byte here
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1b",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val li = graft.util.Tables(spark, sf001, "lineitem")
      val orders = graft.util.Tables(spark, sf001, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val rows = joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"no runtime bloom filter was injected:\n$plan")
      assert(rows.length == 1 && rows(0).getLong(1) > 0)
    }
  }

  test("AQE splits a skewed join partition at runtime") {
    import spark.implicits._
    // one key carries ~100x the rows of every other key, with an
    // incompressible payload so the shuffle blocks have real bytes;
    // repartition spreads the rows over many MAP tasks — a skewed
    // reduce partition can only be split along map-output block
    // boundaries, so a single-mapper input would be unsplittable by
    // design
    val big = spark.range(0, 220000).select(
      when(col("id") < 200000, lit(1L)).otherwise(col("id") % 50 + 2).as("k"),
      concat(lit("payload_"), col("id"), lit("_"),
        md5(col("id").cast("string"))).as("payload"))
      .repartition(8)
    val dim = (1L to 60L).map(k => (k, s"name_$k")).toDF("k2", "name")
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "20KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB") {
      // the aggregate must genuinely consume the wide column (a
      // non-null count folds to count(1) and pruning strips the
      // payload — then the shuffled rows compress to nothing and no
      // partition crosses the skew threshold)
      val joined = big.join(dim, col("k") === col("k2"))
        .agg(count(lit(1)).as("n"), sum(length(col("payload"))).as("bytes"))
      val row = joined.collect()(0)
      assert(row.getLong(0) == 220000L && row.getLong(1) > 0L)
      val smjs = collect(joined.queryExecution.executedPlan) {
        case j: SortMergeJoinExec if j.isSkewJoin => j
      }
      assert(smjs.nonEmpty,
        "AQE did not mark the skewed sort-merge join:\n" +
          joined.queryExecution.executedPlan.toString)
    }
  }
}
