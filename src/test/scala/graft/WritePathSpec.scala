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

  test("compaction bin-packs small files and range-clusters for skipping") {
    import graft.operators.Compaction
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val docs = graft.util.Tables(spark, sf001, "documents")
    docs.repartition(40).write.mode("overwrite").parquet(s"$dir/small")
    val smallFiles = new java.io.File(s"$dir/small").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(smallFiles == 40)

    val res = Compaction.compact(spark, s"$dir/small", s"$dir/packed",
      targetBytes = res0Target(dir), sortCol = Some("doc_id"))
    val packedFiles = new java.io.File(s"$dir/packed").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(packedFiles.length == res.outputFiles && res.outputFiles < 10)
    // content preserved exactly
    val packed = spark.read.parquet(s"$dir/packed")
    assert(packed.exceptAll(docs).isEmpty && docs.exceptAll(packed).isEmpty)
    // range clustering: per-file doc_id ranges don't overlap, so a
    // range predicate can skip whole files on row-group stats
    val ranges = packedFiles.sorted.map { f =>
      val r = spark.read.parquet(f.getPath)
        .agg(min(col("doc_id")), max(col("doc_id"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2, "file ranges overlap")
      case _ =>
    }
  }

  test("compaction preserves a partitioned layout and rejects self-overwrite aliases") {
    import graft.operators.Compaction
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_part").toString
    val docs = graft.util.Tables(spark, sf001, "documents")
      .withColumn("client_id", concat(lit("client_"), col("doc_id") % 3))
    docs.repartition(12).write.mode("overwrite")
      .partitionBy("client_id").parquet(s"$dir/small")

    // dot-segment alias of the input must be caught by the qualified
    // path guard, not clobber the table mid-read
    intercept[IllegalArgumentException] {
      Compaction.compact(spark, s"$dir/small", s"$dir/./small", 1L)
    }

    val res = Compaction.compact(spark, s"$dir/small", s"$dir/packed",
      targetBytes = Long.MaxValue)
    assert(res.partitionCols == Seq("client_id"))
    // layout preserved: key=value subdirs exist and pruning still works
    val sub = new java.io.File(s"$dir/packed").listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("client_id=")).sorted
    assert(sub.length == 3, s"partition dirs: ${sub.mkString(",")}")
    val pruned = spark.read.parquet(s"$dir/packed")
      .filter(col("client_id") === "client_1")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("client_1"),
      s"no partition pruning after compaction:\n$plan")
    // content preserved exactly
    val packed = spark.read.parquet(s"$dir/packed")
      .select(docs.columns.map(col).toSeq: _*)
    assert(packed.exceptAll(docs).isEmpty && docs.exceptAll(packed).isEmpty)
    // compacted: each partition dir holds one packed file, not a
    // stripe from each of the 12 write tasks
    sub.foreach { d =>
      val n = new java.io.File(s"$dir/packed/$d").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(n <= 2, s"$d has $n files")
    }
  }

  test("compaction keeps a two-level layout, pins '01' partition inference, rejects mixed depths") {
    import graft.operators.Compaction
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_2lvl").toString
    val docs = graft.util.Tables(spark, sf001, "documents")
      .withColumn("region", concat(lit("r"), col("doc_id") % 2))
      // numeric-LOOKING values with a leading zero: Spark's standard
      // partition inference reads these back as integers ("01" → 1)
      .withColumn("day", when(col("doc_id") % 2 === 0, "01").otherwise("15"))
    docs.repartition(8).write.mode("overwrite")
      .partitionBy("region", "day").parquet(s"$dir/small")

    val res = Compaction.compact(spark, s"$dir/small", s"$dir/packed",
      targetBytes = Long.MaxValue)
    // the spec is recovered in ORDER from the nested layout
    assert(res.partitionCols == Seq("region", "day"))
    val packed = spark.read.parquet(s"$dir/packed")
    // documented partition-inference behavior: values round-trip, the
    // discovered TYPE of "01"/"15" is integer — same as any Spark read
    // of the input layout, compaction doesn't add its own rules
    assert(packed.schema("day").dataType ==
      spark.read.parquet(s"$dir/small").schema("day").dataType)
    assert(packed.select("day").distinct().as[Int].collect().toSet == Set(1, 15))
    // two-level pruning still works after the rewrite
    val plan = packed.filter(col("region") === "r0" && col("day") === 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition pruning:\n$plan")
    // row content survives (modulo the inferred day type on both sides)
    val roundTrip = packed.select("doc_id", "region", "day")
    val src = spark.read.parquet(s"$dir/small").select("doc_id", "region", "day")
    assert(roundTrip.exceptAll(src).isEmpty && src.exceptAll(roundTrip).isEmpty)

    // a stray data file at the ROOT of the partitioned layout must
    // fail loudly, not silently flatten the table
    docs.limit(1).drop("region", "day").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/stray")
    val strayFile = new java.io.File(s"$dir/stray").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(strayFile.toPath,
      java.nio.file.Paths.get(s"$dir/small/stray.parquet"))
    val e = intercept[IllegalArgumentException] {
      Compaction.compact(spark, s"$dir/small", s"$dir/packed2", Long.MaxValue)
    }
    assert(e.getMessage.contains("inconsistent partition layouts"))
  }

  // aim for ~5 output files regardless of sf0.001 byte size
  private def res0Target(dir: String): Long = {
    val total = new java.io.File(s"$dir/small").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    math.max(1L, total / 5)
  }
}
