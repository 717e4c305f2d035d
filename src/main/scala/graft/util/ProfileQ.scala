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
    val t0 = System.nanoTime()
    val n = Registry.byName(name).run(spark, dir).count()
    println(f"$name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}
