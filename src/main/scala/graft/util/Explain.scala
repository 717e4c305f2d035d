package graft.util

import graft.queries.Registry

/** Plan-inspection main: prints the formatted physical plan of the
  * named queries (or a default set) so pushdown/broadcast/codegen can
  * be reviewed — `runMain graft.util.Explain q01_pricing_summary ...` */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Tables.session("explain")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_pricing_summary", "q02_filter_project", "q03_revenue_by_nation",
        "q06_topk_per_group", "q28_radius_join")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      Registry.byName(n).run(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
