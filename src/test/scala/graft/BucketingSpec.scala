package graft

import org.apache.spark.sql.functions._

/** 100 TB co-location story: two tables bucketed by the join key join
  * WITHOUT a shuffle exchange — the plan-level proof that the merge /
  * enrichment joins can run pre-partitioned at scale (SURVEY §4:
  * "embeddings bucketed by id for merge joins"). */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a join-key shuffle") {
    // (warehouse dir is a static conf — bucketed tables land in the
    // default ./spark-warehouse, dropped again below)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val o = graft.util.Tables(spark, sf001, "orders")
      val c = graft.util.Tables(spark, sf001, "customer")
      o.write.mode("overwrite").bucketBy(8, "o_custkey")
        .sortBy("o_custkey").saveAsTable("orders_b")
      c.write.mode("overwrite").bucketBy(8, "c_custkey")
        .sortBy("c_custkey").saveAsTable("customer_b")

      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))

      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("hashpartitioning(o_custkey") &&
        !plan.contains("hashpartitioning(c_custkey"),
        s"join shuffled on the bucket key unexpectedly:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(joined.collect().map(_.getLong(1)).sum == o.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
