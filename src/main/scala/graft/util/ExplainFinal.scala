package graft.util

import graft.queries.Registry
import org.apache.spark.sql.functions.{col, count}

/** Post-execution plan dump: run the named queries (Bench-identical
  * force) and print the FINAL adaptive plan — what the SQL tab would
  * show — so AQE runtime decisions (stage reuse, coalescing, join
  * rewrites) can be verified, which `Explain`'s pre-execution dump
  * cannot: `runMain graft.util.ExplainFinal q84_compaction_plan ...` */
object ExplainFinal {
  def main(args: Array[String]): Unit = {
    val spark = Tables.session("explain-final")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.enableSessionCache()
    sys.env.get("SPARK_GRAFT_SETCONF").toSeq.flatMap(_.split(';'))
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      }
    args.foreach { n =>
      println(s"\n========== $n ==========")
      val df = Registry.byName(n).run(spark, dir)
      val forced = df.select(df.columns.map(c => count(col(c))).reduce(_ + _))
      forced.collect()
      println(forced.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
