package graft.util

import graft.queries.Registry
import org.apache.spark.sql.functions._

/** Dev-loop subset bench replicating [[graft.Bench]]'s protocol
  * exactly (session table cache, build-plus-force timed, two sweeps,
  * per-query min) so per-query numbers are comparable to
  * `bench_detail.json`: `runMain graft.util.BenchSome <sfDir> <q>...`. */
object BenchSome {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1)
    val spark = Tables.session("bench-some")
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("BENCH_SOME_STAGES"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0
            if (dur > 0.3)
              println(f"  stage ${si.stageId}%-4d $dur%6.2fs tasks=${si.numTasks}%-4d ${si.name.take(70)}")
          }
        })
    Tables.enableSessionCache()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // conf A/B hook (the FloorProbe convention): SPARK_GRAFT_SETCONF=
    // "k=v;k=v" — runtime-settable SQL confs only
    sys.env.get("SPARK_GRAFT_SETCONF").toSeq.flatMap(_.split(';'))
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      }
    // SPARK_GRAFT_STATESTORE=rocksdb times the streaming family on
    // the disk-backed store (same mapping as Bench/Verify/ScaleTrial)
    sys.env.get("SPARK_GRAFT_STATESTORE")
      .foreach(v => spark.conf.set("spark.graft.stateStore", v))
    // A/B hook: AQE's coalesce floor (default 1m) vs compute-dense
    // small-byte shuffles
    sys.env.get("GRAFT_AQE_MINPART").foreach(v =>
      spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", v))
    // A/B hook: AQE per-stage replanning overhead vs its partition
    // coalescing at toy scale
    sys.env.get("GRAFT_AQE").foreach(v =>
      spark.conf.set("spark.sql.adaptive.enabled", v))
    Tables.names.foreach { t =>
      try Tables(spark, dir, t).count() catch { case _: Throwable => }
    }
    // the wide-events copy is session cache too — materialize it
    // BEFORE the keepRdds snapshot or release() evicts it per query
    try Tables.wide(spark, dir, "events").count()
    catch { case _: Throwable => }
    // same scratch hygiene as Bench: drop per-query localCheckpoint
    // blocks (everything outside the session table cache) after each
    // timed run so numbers stay comparable to bench_detail.json
    val keepRdds = spark.sparkContext.getPersistentRDDs.keySet.toSet
    def release(): Unit =
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!keepRdds(id)) rdd.unpersist(blocking = false)
      }
    def timeOne(n: String): Double = {
      val t0 = System.nanoTime()
      val df = Registry.byName(n).run(spark, dir)
      df.select(df.columns.map(c => count(col(c))).reduce(_ + _)).collect()
      val dt = (System.nanoTime() - t0) / 1e9
      release()
      if (sys.env.contains("BENCH_SOME_GC")) System.gc()
      dt
    }
    // warmup sweep (codegen/classload), then two timed sweeps, min
    names.foreach { n => try timeOne(n) catch { case e: Throwable =>
      System.err.println(s"$n warmup failed: ${e.getMessage}") } }
    val s1 = names.map(n => n -> timeOne(n)).toMap
    val s2 = names.map(n => n -> timeOne(n)).toMap
    names.foreach { n =>
      println(f"$n%-32s min=${math.min(s1(n), s2(n))}%6.2f s  (s1=${s1(n)}%5.2f s2=${s2(n)}%5.2f)")
    }
    spark.stop()
  }
}
