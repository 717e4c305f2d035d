package graft.util

import graft.operators.GeoRadiusJoin
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Piecewise timing of the q41 cluster-unify stages at sf0.1. */
object ProfileCluster {
  def main(args: Array[String]): Unit = {
    val spark = Tables.session("profc")
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val k = col("c_custkey")
    val g = ((k - (k % 7)) / 7).cast(LongType)
    val m = k % 7
    val pts = Tables(spark, dir, "customer").select(col("c_custkey"), col("c_acctbal"),
      (lit(9.6d) + (g % 1000).cast(DoubleType) * 0.01d +
        m.cast(DoubleType) * 0.00015d).as("lat"),
      (lit(-84.3d) + ((g * 7) % 1000).cast(DoubleType) * 0.01d).as("lon"))
    timed("points count")(println(pts.count()))
    val right = pts.select(col("c_custkey").as("_dst"),
      col("lat").as("_rlat"), col("lon").as("_rlon"))
    val edges = GeoRadiusJoin(pts, right, "lat", "lon", "_rlat", "_rlon", 0.025)
      .filter(col("c_custkey") =!= col("_dst"))
      .select(col("c_custkey").as("_src"), col("_dst"))
    timed("edges count")(println(edges.count()))
    timed("edges count again")(println(edges.count()))
    val clustered = timed("full clusterUnify")(
      graft.operators.ClusterUnify(pts, "c_custkey", "lat", "lon", 0.025))
    timed("clustered count")(println(clustered.count()))
    timed("final agg")(println(
      clustered.groupBy(col("cluster_id")).agg(count(lit(1))).count()))
    spark.stop()
  }
}
