package graft.util

import graft.queries.Registry

/** One-query profiler: `runMain graft.util.ProfileQ <name> [sfDir]` —
  * times a single registry query with INFO logging from graft
  * operators enabled. */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val spark = Tables.session("profile")
    spark.sparkContext.setLogLevel("WARN")
    org.apache.log4j.LogManager.getLogger("graft").setLevel(org.apache.log4j.Level.INFO)
    val name = args(0)
    val dir = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // conf A/B hook (the FloorProbe convention): SPARK_GRAFT_SETCONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_SETCONF").toSeq.flatMap(_.split(';'))
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
        println(s"[conf] $k=$v")
      }
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
    // cold + warm: the first pass pays JVM/codegen/scan warmup that
    // Bench amortizes across the suite; the warm pass is the number
    // comparable to BENCH_r*.json. Force every output column like
    // Bench.force — a bare count() lets Catalyst prune the very
    // columns being measured (q107's scrub once profiled 0.4 s
    // "warm" while the bench's honest force showed 3.7 s).
    Seq("cold", "warm").foreach { label =>
      val t0 = System.nanoTime()
      val df = Registry.byName(name).run(spark, dir)
      val n = df.select(
        df.columns.map(c => org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.col(c))).reduce(_ + _))
        .head().getLong(0)
      println(f"$name[$label]: forced in ${(System.nanoTime() - t0) / 1e9}%.2fs " +
        s"(count-sum $n)")
      // PROFILEQ_FINALPLAN=1: dump the post-execution adaptive plan —
      // the only way to see what AQE actually did (ReusedExchange,
      // coalesced partitions, runtime join strategy switches); the
      // initial `explain` shows none of it
      if (label == "warm" && sys.env.contains("PROFILEQ_FINALPLAN"))
        println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
