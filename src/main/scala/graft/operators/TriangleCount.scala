package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Per-node triangle participation counts over an undirected edge set
  * (degree-ordered wedge join — the standard skew guard for power-law
  * graphs: wedges form at each triangle's LOWEST-degree corner, so hub
  * fan-out is bounded; Suri & Vassilvitskii 2011, Cohen 2009).
  *
  * Hybrid switch (the ClusterUnify/PageRank convention): below the
  * edge threshold the count runs as ONE executor task — oriented
  * adjacency + binary-search closure, the exact same triangle set —
  * because at a few hundred thousand edges the wedge self-join's
  * stages cost more in scheduling than the whole graph. Above it, the
  * distributed wedge join is the 100-TB path.
  *
  * Input `e`: one row per undirected edge as (u, v) with u < v,
  * deduplicated, long keys, MATERIALIZED by the caller (the count
  * that picks the path re-reads it).
  * Output: (node, triangles) for every node in ≥1 triangle.
  */
object TriangleCount {

  def perNode(e: DataFrame, localSolveMaxEdges: Long = 2000000L): DataFrame = {
    if (e.count() <= localSolveMaxEdges) return localSolve(e)

    val deg = e.select(col("u").as("n"))
      .unionAll(e.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val ori = e
      .join(deg.as("du"), col("u") === col("du.n"))
      .join(deg.as("dv"), col("v") === col("dv.n"))
      .select(
        when(col("du.d") < col("dv.d") ||
            (col("du.d") === col("dv.d") && col("u") < col("v")),
          struct(col("u").as("src"), col("v").as("dst")))
          .otherwise(struct(col("v").as("src"), col("u").as("dst")))
          .as("o"))
      .select(col("o.src").as("src"), col("o.dst").as("dst"))
    val wedges = ori.as("e1").join(ori.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
      .select(col("e1.src").as("p"),
        col("e1.dst").as("x"), col("e2.dst").as("y"))
    // closing-edge probe: the edge list is two longs per row —
    // broadcast it so the wedge stream (the big side, degree²-shaped)
    // never shuffles; past the broadcast threshold AQE falls back to
    // a shuffle join on the same keys
    val tri = wedges.join(broadcast(e),
      least(col("x"), col("y")) === col("u") &&
        greatest(col("x"), col("y")) === col("v"))
    tri.select(explode(array(col("p"), col("x"), col("y"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).cast(LongType).as("triangles"))
  }

  /** One-task exact replay: same degree orientation (lower degree
    * first, id tie-break), same once-per-triangle counting. */
  private def localSolve(e: DataFrame): DataFrame = {
    val schema = StructType(Seq(StructField("node", LongType),
      StructField("triangles", LongType)))
    val rows = e.coalesce(1).rdd.mapPartitions { it =>
      import scala.collection.mutable
      val idx = mutable.HashMap.empty[Long, Int]
      val ids = mutable.ArrayBuffer.empty[Long]
      def id(k: Long): Int =
        idx.getOrElseUpdate(k, { ids += k; ids.size - 1 })
      val us = mutable.ArrayBuffer.empty[Int]
      val vs = mutable.ArrayBuffer.empty[Int]
      it.foreach { r => us += id(r.getLong(0)); vs += id(r.getLong(1)) }
      val nN = ids.size
      val degA = new Array[Int](nN)
      us.foreach(degA(_) += 1)
      vs.foreach(degA(_) += 1)
      // full adjacency, sorted by neighbor NODE ID for binary search
      val adjFull = Array.fill(nN)(mutable.ArrayBuffer.empty[Int])
      var i = 0
      while (i < us.length) {
        adjFull(us(i)) += vs(i); adjFull(vs(i)) += us(i); i += 1
      }
      val adjSorted = adjFull.map(_.toArray.map(ids(_)).sorted)
      def hasEdge(a: Int, bId: Long): Boolean =
        java.util.Arrays.binarySearch(adjSorted(a), bId) >= 0
      // oriented out-adjacency: src = lower degree, id tie-break
      val out = Array.fill(nN)(mutable.ArrayBuffer.empty[Int])
      i = 0
      while (i < us.length) {
        val (a, b) = (us(i), vs(i))
        val aFirst = degA(a) < degA(b) ||
          (degA(a) == degA(b) && ids(a) < ids(b))
        if (aFirst) out(a) += b else out(b) += a
        i += 1
      }
      val cnt = new Array[Long](nN)
      var p = 0
      while (p < nN) {
        // wedge pairs ordered by dst NODE ID (the e1.dst < e2.dst cut)
        val o = out(p).toArray.sortBy(ids(_))
        var a = 0
        while (a < o.length) {
          var b = a + 1
          while (b < o.length) {
            if (hasEdge(o(a), ids(o(b)))) {
              cnt(p) += 1; cnt(o(a)) += 1; cnt(o(b)) += 1
            }
            b += 1
          }
          a += 1
        }
        p += 1
      }
      (0 until nN).iterator.filter(cnt(_) > 0L)
        .map(j => org.apache.spark.sql.Row(ids(j), cnt(j)))
    }
    // lazy-materialize the one-task result: the caller's global
    // orderBy (range-sample + sort) would otherwise run the kernel
    // twice (the LocalExact convention)
    e.sparkSession.createDataFrame(rows, schema)
      .localCheckpoint(eager = false)
  }
}
