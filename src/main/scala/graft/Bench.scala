package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object Bench {
  // Locale.ROOT: a comma decimal separator would corrupt the JSON
  private def fmt(v: Double): String =
    "%.3f".formatLocal(java.util.Locale.ROOT, v)

  /** Evaluate EVERY output column, not just the row count. Under
    * `count()` Catalyst prunes dead columns and eliminates unique-key
    * joins — round 7 timed q98 as a near-bare scan (its left join
    * dropped) and q101 without its encode chain (~3 s of hidden work).
    * A per-column `count(col)` references all columns — the project
    * below the aggregate computes each value to test its nullness —
    * without paying row serialization (a to_json checksum was tried
    * and costs ~10 s of pure JSON formatting on q13's wide output;
    * the mirror duck_bench.py force is `COUNT(COLUMNS(*))`, the same
    * shape). */
  private def force(df: DataFrame): Unit =
    df.select(df.columns.map(c => count(col(c))).reduce(_ + _)).collect()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // static conf (see util/Tables.session): the 100-entry default
      // codegen class cache thrashes under a 150-query session — the
      // heavy lazy-chain queries repaid seconds of janino compilation
      // every sweep (q106 measured 2.3× slower from eviction alone)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_STATESTORE=rocksdb times the streaming family on
    // the disk-backed store (same hook as Verify/ScaleTrial)
    sys.env.get("SPARK_GRAFT_STATESTORE")
      .foreach(v => spark.conf.set("spark.graft.stateStore", v))
    // ten base tables, 95 queries: read each parquet once per session
    graft.util.Tables.enableSessionCache()
    // JVM/codegen warmup outside the timed region: the flagship entry
    // plus a spread of expression-heavy queries at the smallest SF,
    // so the alphabetically-first timed queries don't absorb
    // first-use codegen/classloading cost
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    // prefer the smallest SF for warmup; fall back to the bench dir so
    // the warmup never silently no-ops on a different data layout
    val warmDir =
      if (new java.io.File("/root/testdata/sf0.001").isDirectory)
        "/root/testdata/sf0.001"
      else sfDir
    Seq("q01_pricing_summary", "q22_minhash_lsh", "q74_simhash_neardup",
      "q75_winnowing", "q76_tfidf_topterms", "q86_dedup_survivors").foreach { q =>
      try force(SparkEntry.queries(q)(spark, warmDir))
      catch { case _: Throwable => }
    }
    // materialize the session table cache for the BENCH dir before any
    // timed pass: otherwise the alphabetically-first queries touching
    // each table pay persist-on-first-touch inside sweep 1 (q01/q05/q06
    // doubled r5→r6 from exactly this). events.parquet carries
    // TIMESTAMP(NANOS) — set the legacy conf BEFORE its first read so
    // the cached plan resolves the schema the way the queries expect.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.util.Tables.names.foreach { t =>
      try graft.util.Tables(spark, sfDir, t).count()
      catch { case _: Throwable => }
    }
    // the wide copies are session cache too — materialize them
    // BEFORE the keepRdds snapshot or release() evicts them per query
    Seq("events", "documents", "orders", "embeddings").foreach { t =>
      try graft.util.Tables.wide(spark, sfDir, t).count()
      catch { case _: Throwable => }
    }
    // Query-scratch hygiene: every operator `localCheckpoint` (lineage
    // truncation in the iterative/self-join kernels) pins its blocks in
    // the block manager for the SESSION, not the query — across the
    // warmup plus two timed sweeps of the 150-query registry that is
    // ~10³ leaked scratch RDDs crowding the storage pool and stretching
    // every GC scan while later queries run (q106 measured ~2× slower
    // in-suite than isolated from exactly this). Snapshot the RDD ids
    // that belong to the session table cache, then after each timed
    // query drop everything else — each invocation rebuilds its own
    // scratch from scratch, so no released block is ever re-read.
    val keepRdds = spark.sparkContext.getPersistentRDDs.keySet.toSet
    def release(): Unit =
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!keepRdds(id)) rdd.unpersist(blocking = false)
      }
    // Two full interleaved sweeps, per-query MIN: one timed pass makes
    // the official number hostage to background load (a transient
    // contention spike once cost a trivial 6-group agg 10 s). A spike
    // lands on DIFFERENT queries in each sweep, so the min recovers the
    // machine-quiet timing; sweep 1 also warms the table cache, so
    // sweep 2 measures steady state.
    // dev loop: trailing args restrict the sweep to named queries
    // (the driver passes none and times the full registry)
    val only = args.toSet
    def sweep(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.isEmpty || only(name) }
        .map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { force(fn(spark, sfDir)) } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}") }
        val dt = (System.nanoTime() - t0) / 1e9
        release() // outside the timed region; scratch is never reused
        name -> dt
      }
    val (s1, s2) = (sweep(), sweep())
    val results = s1.zip(s2).map { case ((name, a), (_, b)) => name -> math.min(a, b) }
    val total = results.map(_._2).sum
    // machine-readable batch/streaming split: the streaming pipelines
    // do categorically different work than their batch-SQL oracles
    // (state stores + micro-batch scheduling), so comparator ratios
    // must be computable both ways without a hand-maintained list
    val streamingSet = SparkEntry.streamingQueries
    val streamingNames = results.map(_._1).filter(streamingSet).sorted
    val streamingTotal = results.filter(r => streamingSet(r._1)).map(_._2).sum
    def qsJson(qs: Seq[(String, Double)]): String =
      qs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    // full per-query detail goes to a file: at 92 queries the map is
    // ~3 KB, which overflows the driver's fixed-size stdout tail
    // capture and makes the final line unparseable. The LAST stdout
    // line is a compact summary (total + top-5 slowest), kept well
    // under the 2,000-byte window.
    val detailPath = "bench_detail.json"
    val detail =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},""" +
        s""""batch_total":${fmt(total - streamingTotal)},""" +
        s""""streaming_total":${fmt(streamingTotal)},""" +
        s""""streaming":${streamingNames.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
        s""""queries":${qsJson(results)},"sf":"$sfDir"}"""
    val pw = new java.io.PrintWriter(detailPath)
    try pw.println(detail) finally pw.close()
    val slowest = results.sortBy(-_._2).take(5)
    val summary =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},""" +
        s""""batch_total":${fmt(total - streamingTotal)},""" +
        s""""queries":${qsJson(slowest)},"detail":"$detailPath","sf":"$sfDir"}"""
    assert(summary.getBytes("UTF-8").length < 1500,
      s"bench summary line must stay under the driver's tail window: $summary")
    println(summary)
    spark.stop()
  }
}
