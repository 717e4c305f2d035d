package graft

import graft.queries.Registry
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Properties of the retrieval / classification / profiling family
  * (q126–q138) that the DuckDB oracle can't express directly:
  * prefix-filter COMPLETENESS on adversarial near-dup corpora,
  * partition invariance of the quantized-integer aggregates, and the
  * stump's argmax against an in-memory brute force.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def rows(name: String, dir: String = sf001): Seq[Row] =
    Registry.byName(name).run(spark, dir).collect().toSeq

  test("q133 prefix filter is complete: equals brute force on an " +
    "adversarial corpus written to a temp dir") {
    // docs designed so the rarest-shingle prefix is exercised: two
    // exact dups, one 1-token edit (J just over 1/2 for 12 tokens),
    // one disjoint, one short (< 3 tokens → no shingles)
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val edit = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"
    val docs = Seq(
      (0L, base, "en", "s1", base.length.toLong),
      (1L, base, "en", "s1", base.length.toLong),
      (2L, edit, "en", "s1", edit.length.toLong),
      (3L, "one two", "en", "s1", 7L),
      (4L, "totally different words here entirely now yes ok fine done good end",
        "en", "s1", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("allpairs").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = rows("q133_allpairs_jaccard", dir)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(5)))
    // brute force over distinct shingle sets
    def sh(t: String): Set[String] =
      t.split("\\s+").filter(_.nonEmpty).sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toSet
    val m = Seq(0L -> base, 1L -> base, 2L -> edit, 3L -> "one two",
      4L -> "totally different words here entirely now yes ok fine done good end")
    val want = (for {
      (d1, t1) <- m; (d2, t2) <- m if d1 < d2
      a = sh(t1); b = sh(t2); i = (a intersect b).size
      if a.nonEmpty && b.nonEmpty && 3 * i >= a.size + b.size
    } yield (d1, d2, i.toLong * 10000 / (a.size + b.size - i))).toSeq
    assert(got.toSet === want.toSet)
    assert(got.nonEmpty) // the dup pair + the 1-edit pair must appear
  }

  test("q127 NB model grid is complete and predictions are " +
    "repartition-invariant") {
    val out = Registry.byName("q127_nb_classify").run(spark, sf001)
    val a = out.collect().toSeq
    // same query under a different shuffle width must be identical
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = Registry.byName("q127_nb_classify").run(spark, sf001)
        .collect().toSeq
      assert(a === b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    // every test doc predicted at most once, scores non-negative
    val ids = a.map(_.getLong(0))
    assert(ids.distinct.size === ids.size)
    assert(a.forall(_.getLong(2) >= 0L))
  }

  test("q135 stump equals in-memory brute-force Gini argmax") {
    val Seq(r) = rows("q135_decision_stump")
    val data = spark.read.parquet(s"$sf001/orders.parquet")
      .select(expr("CAST(round(o_totalprice * 1000000) AS BIGINT)"),
        col("o_orderstatus")).as[(Long, String)].collect().toSeq
    val n = data.size.toLong
    val byV = data.groupBy(_._1)
    val vs = byV.keys.toSeq.sorted
    val classes = data.map(_._2).distinct.sorted
    var cum = classes.map(_ => 0L)
    var best: (BigInt, Long) = (BigInt(-1), Long.MaxValue)
    var bestNl = 0L
    for (v <- vs) {
      val cnt = classes.map(c => byV(v).count(_._2 == c).toLong)
      cum = cum.zip(cnt).map { case (x, y) => x + y }
      val nl = cum.sum
      if (nl < n) {
        val nr = n - nl
        val tot = classes.map(c => data.count(_._2 == c).toLong)
        val ssqL = cum.map(BigInt(_)).map(x => x * x).sum
        val ssqR = tot.zip(cum).map { case (t, x) => BigInt(t - x).pow(2) }.sum
        val num = ssqL * nr + ssqR * nl
        val den = BigInt(nl) * nr
        val score = (num / den) * 1048576 + (num % den) * 1048576 / den
        if (score > best._1 || (score == best._1 && v < best._2)) {
          best = (score, v); bestNl = nl
        }
      }
    }
    assert(r.getLong(0) === best._2)
    assert(r.getLong(1) === bestNl)
    assert(BigInt(r.getLong(3)) === best._1)
  }

  test("q136 drift output is repartition-invariant (scaled-long sums " +
    "are reduction-order exact)") {
    val a = rows("q136_embedding_drift")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      val b = rows("q136_embedding_drift")
      assert(a === b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("sorted_intersect_count equals size(array_intersect) on random " +
    "sorted distinct arrays, codegen and interpreted") {
    val rng = new scala.util.Random(42)
    val rows = (0 until 200).map { i =>
      def arr() = (0 until rng.nextInt(30))
        .map(_ => s"w${rng.nextInt(40)}").distinct.sorted
      (i, arr(), arr())
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"),
        graft.functions.SortedIntersect.intersectCount(col("a"), col("b"))
          .as("k"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .collect()
    got.foreach(r => assert(r.getLong(1) === r.getLong(2), s"row ${r.getInt(0)}"))
    // SQL-registered path too
    graft.GraftFunctions.registerAll(spark)
    df.createOrReplaceTempView("si_t")
    val viaSql = spark.sql(
      "SELECT sum(sorted_intersect_count(a, b)) FROM si_t").collect()(0).getLong(0)
    assert(viaSql === got.map(_.getLong(2)).sum)
  }

  test("q126 BM25 idf is always positive and tf term saturates " +
    "below (k1+1) scale") {
    val out = Registry.byName("q126_bm25_topk").run(spark, sf001)
    val got = out.collect()
    assert(got.nonEmpty)
    // bm25_s = Σ idf_fl2 · s_tf with idf_fl2 ≥ 0 (Lucene idf ≥ log2 1)
    // and s_tf < 2.2·2¹⁰; with ≤3 query terms the score is bounded
    assert(got.forall(_.getLong(2) >= 0L))
    val maxSTf = (2.2 * 1024).toLong
    val maxIdf = 41L // floor-log2 of a ≤2^61 ratio, minus 20
    assert(got.forall(_.getLong(2) <= 3 * maxIdf * maxSTf))
  }
}
