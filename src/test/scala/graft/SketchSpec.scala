package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Mergeability of the cardinality sketches (q79 KMV, q83 HLL): the
  * sketch built from partial sketches over arbitrary data splits must
  * equal the sketch built over the whole data — the property that
  * makes them partial-aggregable (map-side combine) at 100 TB.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def hashed(ids: Seq[Long]): DataFrame =
    ids.toDF("user_id").select(
      conv(substring(md5(col("user_id").cast(StringType)), 1, 12), 16, 10)
        .cast(LongType).as("h"))

  /** HLL registers (bucket → max rank), as in q83_hll_registers. */
  private def hllRegisters(df: DataFrame): Map[Long, Int] = df
    .select(col("h").bitwiseAND(lit(63L)).as("bucket"),
      shiftright(col("h"), 6).as("suffix"))
    .withColumn("pos", instr(lpad(bin(col("suffix")), 42, "0"), "1"))
    .withColumn("r", when(col("pos") === 0, lit(43)).otherwise(col("pos")))
    .groupBy(col("bucket")).agg(max(col("r")).as("mj"))
    .as[(Long, Int)].collect().toMap

  test("HLL registers merge by max across splits") {
    val rng = new scala.util.Random(11)
    val ids = Seq.fill(5000)(rng.nextLong().abs % 100000L)
    val (a, b) = ids.splitAt(2000)
    val whole = hllRegisters(hashed(ids))
    val merged = (hllRegisters(hashed(a)).toSeq ++ hllRegisters(hashed(b)).toSeq)
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    assert(merged == whole)
  }

  test("KMV bottom-k merges as bottom-k of the union") {
    val rng = new scala.util.Random(13)
    val ids = Seq.fill(5000)(rng.nextLong().abs % 100000L)
    val (a, b) = ids.splitAt(1700)
    val k = 64
    def bottomK(df: DataFrame): Seq[Long] = df.select(col("h")).distinct()
      .orderBy(col("h")).limit(k).as[Long].collect().toSeq
    val whole = bottomK(hashed(ids))
    val merged = (bottomK(hashed(a)) ++ bottomK(hashed(b)))
      .distinct.sorted.take(k)
    assert(merged == whole)
  }

  /** CMS counter matrix (row, col) → n, as in q109_cms_counts. */
  private def cmsCounters(df: DataFrame): Map[(Int, Int), Long] = df
    .select(explode(expr(
      "transform(sequence(0, 3), i -> named_struct('r', i, " +
        "'c', CAST(conv(substring(md5(concat(k, '#', CAST(i AS STRING))), " +
        "1, 8), 16, 10) AS BIGINT) % 64))")).as("b"))
    .groupBy(col("b.r").as("r"), col("b.c").as("c"))
    .agg(count(lit(1)).as("n"))
    .as[(Int, Long, Long)].collect().map { case (r, c, n) => (r, c.toInt) -> n }.toMap

  test("CMS counters merge by addition; estimates bound exact counts from above") {
    val rng = new scala.util.Random(17)
    // zipfish key stream: few hot keys, long tail — the regime CMS is for
    val keys = Seq.fill(4000)("k" + (math.sqrt(rng.nextInt(10000)).toInt))
    val (a, b) = keys.splitAt(1500)
    def df(s: Seq[String]) = s.toDF("k")
    val whole = cmsCounters(df(keys))
    val merged = (cmsCounters(df(a)).toSeq ++ cmsCounters(df(b)).toSeq)
      .groupBy(_._1).map { case (rc, vs) => rc -> vs.map(_._2).sum }
    assert(merged == whole, "counter matrices must merge by addition")
    // point estimate = min over the d rows; never underestimates
    val exact = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val est = exact.keys.map { k =>
      val cells = cmsCounters(df(Seq(k))) // this key's (r,c) positions
      k -> cells.keys.map(whole).min
    }.toMap
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"CMS underestimated $k: ${est(k)} < $n")
    }
    // with 4000 draws over ~100 keys and 4×64 counters, the hot keys
    // dominate their cells: the estimate must be tight for the hottest
    val hottest = exact.maxBy(_._2)._1
    assert(est(hottest) <= exact(hottest) * 2,
      "CMS estimate wildly loose on the hottest key — hash scheme broken?")
  }

  test("Bloom filters over splits merge by bit_or; no false negatives") {
    import graft.operators.BloomFilter
    val rng = new scala.util.Random(23)
    val keys = Seq.fill(600)(rng.nextLong().abs % 1000000L).distinct
    val (a, b) = keys.splitAt(250)
    def bits(s: Seq[Long]): Map[Long, Long] =
      BloomFilter.build(s.toDF("k"), "k", words = 256)
        .as[(Long, Long)].collect().toMap
    val whole = bits(keys)
    val merged = (bits(a).toSeq ++ bits(b).toSeq)
      .groupBy(_._1).map { case (w, vs) => w -> vs.map(_._2).reduce(_ | _) }
    assert(merged == whole, "bloom word tables must merge by bitwise OR")
    // every build key must pass its own filter — zero false negatives
    val pass = BloomFilter.probe(keys.toDF("k"), "k",
        BloomFilter.build(keys.toDF("k"), "k", words = 256), words = 256)
      .filter(col("pass") === 1).as[(Long, Int)].collect().map(_._1).toSet
    assert(keys.forall(pass), "a build key failed its own bloom probe")
  }

  test("BottomKDistinct aggregator: partition-count invariant, dedups, no window in plan") {
    val k = 8
    val agg = org.apache.spark.sql.functions.udaf(
      new graft.functions.BottomKDistinct(k),
      org.apache.spark.sql.Encoders.scalaLong)
    // values with heavy duplication so dedup-inside-the-sketch matters
    val vals = (1 to 2000).map(i => (i % 5).toString -> (i % 37).toLong)
    def run(nPart: Int): Map[String, Seq[Long]] =
      vals.toDF("g", "v").repartition(nPart)
        .groupBy(col("g")).agg(agg(col("v")).as("bk"))
        .as[(String, Seq[Long])].collect().toMap
    val one = run(1)
    val many = run(13)
    assert(one == many, "bottom-k state must be partitioning-invariant")
    // each group saw values 0..36; bottom-8 distinct = 0..7
    assert(one.values.forall(_ == (0L until k.toLong)))
    // the q79 shape: a hash/object aggregate with map-side partials,
    // never a window sort
    val plan = vals.toDF("g", "v").groupBy(col("g"))
      .agg(agg(col("v")).as("bk")).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected an aggregate exec:\n$plan")
    assert(!plan.contains("Window"), s"bottom-k must not plan a window:\n$plan")
  }
}
