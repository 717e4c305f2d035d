package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Skew-insurance measurement for the triangle-count plan choice
  * (round-14 verdict ask): on a power-law co-purchase fixture with one
  * hub part injected into a slice of the sampled orders, time the
  * engine's DEGREE-oriented wedge join (graft.operators.TriangleCount,
  * Suri & Vassilvitskii 2011) against the ID-ordered wedge join the
  * DuckDB oracle uses, over the IDENTICAL materialized edge set, and
  * assert the two plans agree. ID ordering puts every hub edge
  * out of a min-id hub — wedge volume C(deg_hub, 2) — while degree
  * ordering points hub edges INTO the hub, bounding per-node wedge
  * work by out-degree² ≤ O(m).
  *
  * `runMain graft.util.SkewProbe <dir-with-lineitem.parquet>`
  * (fixture: one hub partkey added to ~2% of the sampled quarter —
  * hub degree ~27.5k of ~200k parts, ~380M id-ordered hub wedges).
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = Tables.session("skewprobe")
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/tmp/graft_skew")
    val e = Tables(spark, dir, "lineitem")
      .filter(col("l_orderkey") % 4 === 0)
      .groupBy(col("l_orderkey").as("ok"))
      .agg(collect_set(col("l_partkey")).as("arr"))
      .select(explode(col("arr")).as("u"), col("arr"))
      .select(col("u"), explode(col("arr")).as("v"))
      .filter(col("u") < col("v"))
      .select(col("u"), col("v"))
      .distinct()
      .localCheckpoint() // eager: both plans read the same blocks
    println(s"edges: ${e.count()}")

    def time(label: String)(df: => DataFrame): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      val r = df.agg(count(lit(1)), sum(col("triangles"))).head()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$label%-16s $dt%8.2f s   nodes=${r.getLong(0)} " +
        s"triangleSum=${r.getLong(1)}")
      (dt, r.getLong(0), r.getLong(1))
    }

    // the engine's plan (forced distributed — the fixture is above the
    // local threshold anyway, but make the posture explicit)
    val degree = time("degree-oriented") {
      graft.operators.TriangleCount.perNode(e, localSolveMaxEdges = 0L)
    }

    // the oracle's plan shape: orient by id (u < v already), wedge
    // self-join on the shared smaller endpoint, closing-edge probe —
    // identical tail (broadcast probe, explode, groupBy) so the ONLY
    // difference is the orientation rule
    val idOrdered = time("id-ordered") {
      val ori = e.select(col("u").as("src"), col("v").as("dst"))
      val wedges = ori.as("e1").join(ori.as("e2"),
          col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
        .select(col("e1.dst").as("x"), col("e2.dst").as("y"),
          col("e1.src").as("p"))
      wedges.join(broadcast(e),
          col("x") === col("u") && col("y") === col("v"))
        .select(explode(array(col("p"), col("x"), col("y"))).as("node"))
        .groupBy(col("node"))
        .agg(count(lit(1)).cast(LongType).as("triangles"))
    }

    require(degree._2 == idOrdered._2 && degree._3 == idOrdered._3,
      s"plan disagreement: $degree vs $idOrdered")
    println(f"id-ordered / degree-oriented = ${idOrdered._1 / degree._1}%.1fx")
    spark.stop()
  }
}
