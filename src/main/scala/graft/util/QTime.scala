package graft.util
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.Registry

/** Dev-loop single-query timer with the Bench force + plan dump. */
object QTime {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.enableSessionCache()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.names.foreach { t => try Tables(spark, dir, t).count() catch { case _: Throwable => } }
    names.foreach { n =>
      // rebuild the plan EVERY pass: a query fn's localCheckpoints are
      // built at plan-construction time, so re-forcing one DataFrame
      // would time only the post-checkpoint tail — Bench calls the fn
      // fresh per sweep, and this must measure the same thing
      def force() = {
        val df = Registry.byName(n).run(spark, dir)
        df.select(df.columns.map(c => count(col(c))).reduce(_ + _)).collect()
      }
      force()
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        force()
        println(f"$n run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      if (sys.env.contains("QTIME_EXPLAIN"))
        Registry.byName(n).run(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
