package graft

import graft.queries.Registry
import org.apache.spark.sql.functions._

/** Brute-force cross-checks for the round-8 embedding/corpus analytics
  * (q156/q157/q158): in-memory Scala recomputations from the raw
  * sf0.001 parquet — a THIRD implementation, independent of both the
  * Spark plans and the DuckDB oracle SQL — verifying the quantization,
  * signed truncating division, and tie-break conventions end to end.
  */
class VectorAnalyticsSpec extends SparkSpec {

  private def rows(name: String) =
    Registry.byName(name).run(spark, sf001).collect().toSeq

  /** Spark round() / DuckDB round() on DOUBLE: HALF_UP (away from
    * zero) — math.round would differ on negative halves. */
  private def q6(x: Float): Long =
    java.math.BigDecimal.valueOf(x.toDouble * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  private lazy val vecs: Seq[(Long, Int, Array[Long])] =
    spark.read.parquet(s"$sf001/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect().map { r =>
        (r.getLong(0), r.getInt(1),
          r.getSeq[Float](2).map(q6).toArray)
      }.toSeq

  test("q156 confusion matrix equals the in-memory nearest-centroid classifier") {
    val byLabel = vecs.groupBy(_._2)
    val centroids: Map[Int, Array[Long]] = byLabel.map { case (l, vs) =>
      val d = vs.head._3.length
      l -> Array.tabulate(d) { i =>
        val s = vs.map(v => BigInt(v._3(i))).sum
        (s / vs.size).toLong // BigInt / truncates toward zero = Spark div = DuckDB //
      }
    }
    val labels = centroids.keys.toSeq.sorted
    val confusion = vecs
      .map { case (_, l, qv) =>
        val pred = labels.minBy { cl =>
          val c = centroids(cl)
          var s = BigInt(0)
          var i = 0
          while (i < qv.length) { val dlt = qv(i) - c(i); s += BigInt(dlt) * dlt; i += 1 }
          (s, cl) // tie -> smaller label
        }
        (l, pred)
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = rows("q156_centroid_classify")
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got === confusion.map { case ((l, p), n) => (l, p) -> n })
  }

  test("q157 Gram cells equal the in-memory exact second-moment matrix") {
    val d = vecs.head._3.length
    val brute = scala.collection.mutable.Map.empty[(Long, Long), BigInt]
    vecs.foreach { case (_, _, qv) =>
      var i = 0
      while (i < d) {
        var j = i
        while (j < d) {
          val k = ((i + 1).toLong, (j + 1).toLong)
          brute(k) = brute.getOrElse(k, BigInt(0)) + BigInt(qv(i)) * qv(j)
          j += 1
        }
        i += 1
      }
    }
    val got = rows("q157_gram_matrix")
      .map(r => (r.getLong(0), r.getLong(1)) -> BigInt(r.getLong(2))).toMap
    assert(got.size === d * (d + 1) / 2)
    assert(got === brute.toMap)
  }

  test("q158 Zipf slope equals the in-memory closed-form OLS") {
    def log2(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val expect = docs.groupBy(_._1).map { case (src, ds) =>
      val counts = ds.flatMap(_._2.trim.split("\\s+").filter(_.nonEmpty))
        .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      val ranked = counts.sortBy { case (w, c) => (-c, w) }.zipWithIndex
        .map { case ((_, c), idx) => (log2(idx + 1L), log2(c)) }
      val n = BigInt(ranked.size)
      val sx = ranked.map(p => BigInt(p._1)).sum
      val sy = ranked.map(p => BigInt(p._2)).sum
      val sxy = ranked.map(p => BigInt(p._1) * p._2).sum
      val sxx = ranked.map(p => BigInt(p._1) * p._1).sum
      val slope = (BigInt(1000000) * (n * sxy - sx * sy)) / (n * sxx - sx * sx)
      val icept = (BigInt(1000000) * sy - slope * sx) / n
      src -> (ranked.size.toLong, slope.toLong, icept.toLong)
    }
    val got = rows("q158_zipf_slope")
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === expect)
  }

  test("cell-probe hard negatives equal the exact q194 mine when every cell is probed") {
    import graft.operators.SimilaritySearch
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val centroids = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cell_id"), col("embedding").as("cell_vec"))
    val nCells = centroids.count().toInt
    val idx = SimilaritySearch.buildIndex(
      emb.select(col("vec_id").as("n_id"), col("embedding").as("n_vec"),
        col("label").as("n_lbl")),
      centroids, "n_id", "n_vec")
    val anchors = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("a_id"), col("embedding").as("a_vec"),
        col("label").as("a_lbl"))
    // nProbe = nCells degenerates the probe to the exact search, so
    // the result must match the registry's broadcast-exact q194
    val got = SimilaritySearch.probeHardNegatives(anchors, idx, centroids,
        "a_id", "a_vec", "a_lbl", "n_id", "n_lbl", "n_vec",
        k = 3, nProbe = nCells)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val exact = rows("q194_hard_negatives")
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(got == exact)
    // a partial probe returns a subset of label-mismatch pairs
    val partial = SimilaritySearch.probeHardNegatives(anchors, idx, centroids,
        "a_id", "a_vec", "a_lbl", "n_id", "n_lbl", "n_vec",
        k = 3, nProbe = 2).collect()
    val labelOf = vecs.map(v => v._1 -> v._2).toMap
    assert(partial.forall(r => labelOf(r.getLong(0)) != labelOf(r.getLong(1))),
      "partial probe surfaced a same-label pair")
  }
}
