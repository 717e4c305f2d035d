package graft.util

import graft.queries.Registry
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.functions.{col, count}

/** Decomposes the per-query cost floor: for each named registry query
  * (warm pass, Bench-identical force), prints
  *   build   — DataFrame construction (eager per-op analysis)
  *   plan    — executedPlan resolution (optimizer + physical planning)
  *   exec    — job execution
  *   jobs/stages/tasks — scheduling volume
  * `runMain graft.util.FloorProbe [sfDir] q… q…` — the tool behind the
  * BASELINE.md floor decomposition: ~140 queries run 0.1–1 s on KB-scale
  * inputs against DuckDB's 10–80 ms, and the split between driver-side
  * planning and scheduled-stage latency decides what (if anything) is
  * worth attacking at the 100-TB design point, where both terms vanish
  * against scan time.
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val spark = Tables.session("floorprobe")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.filter(_.startsWith("/"))
      .getOrElse("/root/testdata/sf0.1")
    val names = args.filterNot(_.startsWith("/")).toSeq match {
      case Seq() => Registry.all.map(_.name)
      case s => s
    }
    // conf A/B hook: SPARK_GRAFT_SETCONF="k=v;k=v" (runtime-settable
    // SQL confs only — static core confs go through javaOptions -D)
    sys.env.get("SPARK_GRAFT_SETCONF").toSeq.flatMap(_.split(';'))
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
        println(s"[conf] $k=$v")
      }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.enableSessionCache()
    Tables.names.foreach(t => try Tables(spark, dir, t).count() catch { case _: Throwable => })
    Seq("events", "documents", "orders", "embeddings").foreach { t =>
      try Tables.wide(spark, dir, t).count() catch { case _: Throwable => }
    }

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += s.stageInfo.numTasks
      }
    })
    val keep = spark.sparkContext.getPersistentRDDs.keySet.toSet
    println(f"${"query"}%-34s${"build"}%8s${"plan"}%8s${"exec"}%8s${"total"}%8s jobs stg tasks")
    names.foreach { name =>
      // warm pass first (codegen + scan warm, like Bench's sweep 1)
      def once(report: Boolean): Unit = {
        jobs = 0; stages = 0; tasks = 0
        val t0 = System.nanoTime()
        val df = Registry.byName(name).run(spark, dir)
        val t1 = System.nanoTime()
        val forced = df.select(df.columns.map(c => count(col(c))).reduce(_ + _))
        forced.queryExecution.executedPlan // resolve without running
        val t2 = System.nanoTime()
        forced.collect()
        val t3 = System.nanoTime()
        spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
          if (!keep(id)) rdd.unpersist(blocking = false)
        }
        // listener bus is async — give it a beat before reading counters
        Thread.sleep(150)
        if (report)
          println(f"$name%-34s${(t1 - t0) / 1e9}%8.3f${(t2 - t1) / 1e9}%8.3f" +
            f"${(t3 - t2) / 1e9}%8.3f${(t3 - t0) / 1e9}%8.3f $jobs%4d $stages%3d $tasks%5d")
      }
      // warm once, then report the FASTEST of three passes (matches
      // Bench's min-of-sweeps contamination guard)
      try { once(report = false); once(report = true); once(report = true); once(report = true) }
      catch { case e: Throwable => println(s"$name FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
