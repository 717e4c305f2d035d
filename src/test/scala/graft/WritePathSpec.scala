package graft

import graft.operators.{MergeUpsert, Multimodal}
import org.apache.spark.sql.functions._

/** Write-path scale behaviors: partition pruning on partitioned
  * layouts and foreachBatch incremental merge (ST2's queue-worker sink
  * as a streaming micro-batch merge). */
class WritePathSpec extends SparkSpec {
  import spark.implicits._

  test("client_id-partitioned writes prune to one partition on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Multimodal.syntheticAssets(spark, sf001).toDF()
      .withColumn("byte_size", length(col("content")))
      .drop("content")
      .write.mode("overwrite").partitionBy("client_id").parquet(dir)

    val q = spark.read.parquet(dir).filter(col("client_id") === "client_1")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("client_1"),
      s"no partition pruning:\n$plan")
    assert(q.count() == 100) // 500 docs / 5 clients
  }

  test("foreachBatch applies hash-gated merge per micro-batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fb").toString
    // batch 1 inserts k1/k2; batch 2 updates k2 and inserts k3
    Seq((1L, "v1", "h1")).toDF("k", "v", "hash").write.parquet(s"$dir/b1")
    Seq((2L, "v2b", "h2b"), (3L, "v3", "h3")).toDF("k", "v", "hash")
      .write.parquet(s"$dir/b2")

    var target = Seq((2L, "v2", "h2")).toDF("k", "v", "hash")
      .withColumn("status", lit("active"))
    val stream = spark.readStream
      .schema("k LONG, v STRING, hash STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/*")

    // sibling of the source dir — a sink INSIDE the $dir/* source glob
    // would make the stream's own output eligible as input on restart
    val sinkDir = java.nio.file.Files.createTempDirectory("graft_fb_sink").toString
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val b = batch.withColumn("status", lit("active"))
        // softDelete=false: a micro-batch is incremental, not a full
        // snapshot — absence must not delete (unlike the full-batch
        // ingest path)
        val merged = MergeUpsert(target, b, Seq("k"), "hash", softDelete = false)
          .drop("merge_action")
        target = merged.localCheckpoint() // materialize outside the stream
        // the worker-loop sink: each micro-batch REWRITES the parquet
        // table to the merged state (reference RQ worker,
        // src/api/routers/docs.py:26-113)
        target.write.mode("overwrite").parquet(sinkDir)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val out = target.select("k", "v").as[(Long, String)].collect().toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(2L) == "v2b") // hash-gated update applied

    // the on-disk sink equals the BATCH twin: one merge of the full
    // input applied to the same initial target
    val batchTwin = MergeUpsert(
      Seq((2L, "v2", "h2")).toDF("k", "v", "hash").withColumn("status", lit("active")),
      spark.read.parquet(s"$dir/b1", s"$dir/b2").withColumn("status", lit("active")),
      Seq("k"), "hash", softDelete = false).drop("merge_action")
    val sunk = spark.read.parquet(sinkDir)
    assert(sunk.count() == 3)
    assert(sunk.exceptAll(batchTwin).isEmpty && batchTwin.exceptAll(sunk).isEmpty)
  }
}
