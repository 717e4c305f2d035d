package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Threshold-straddle trial for the r14 duplicate-group collapse gate
  * (r15 evidence run, SCALING.md): a 10×-sized corpus of UNIQUE texts
  * (replica-tagged copies of the sf0.1 documents) plus exactly D
  * duplicate rows, for D just below and just above the gate point
  * `maxBucket / 2` (= 500 at the registry's maxBucket = 1000). Each D
  * is timed with the gate in its DEFAULT position and FORCED to the
  * opposite one (`spark.graft.dupCollapseMinExtras` = 10^18 forces
  * off, 1 forces on), so the rows show both that the gate flips
  * exactly where documented and what each position costs there.
  * Output parity between positions is asserted on the pair count.
  * `runMain graft.util.AbDupGate [sfDir]` */
object AbDupGate {
  def main(args: Array[String]): Unit = {
    val spark = Tables.session("ab-dupgate")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    // 10× corpus with unique texts: replica tag appended to the text
    // so rows − distinct(text) = 0 before the injected duplicates
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n = base.count()
    val uniq10 = (0 until 10).map { i =>
      base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        concat(col("text"), lit(s" replica$i")).as("text"))
    }.reduce(_ unionByName _)
    val staged = Scratch.tempDir("ab_dupgate")
    uniq10.repartition(32).write.mode("overwrite").parquet(staged)
    println(s"corpus: ${n * 10} unique-text docs staged at $staged")

    def corpus(dups: Int): DataFrame = {
      val u = spark.read.parquet(staged)
      u.unionByName(u.orderBy(col("doc_id")).limit(dups)
        .select((col("doc_id") + lit(100000000L)).as("doc_id"), col("text")))
    }
    def force(df: DataFrame): Unit =
      df.select(df.columns.map(c => count(col(c))).reduce(_ + _)).collect()
    def timed(dups: Int, minExtras: Option[String]): (Double, Long) = {
      minExtras match {
        case Some(v) => spark.conf.set("spark.graft.dupCollapseMinExtras", v)
        case None => spark.conf.unset("spark.graft.dupCollapseMinExtras")
      }
      val df = graft.operators.Dedup.minhashCandidates(
        corpus(dups), "doc_id", "text")
      val t0 = System.nanoTime()
      force(df)
      val dt = (System.nanoTime() - t0) / 1e9
      val pairs = graft.operators.Dedup.minhashCandidates(
        corpus(dups), "doc_id", "text").count()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      (dt, pairs)
    }
    // warm
    timed(0, None)
    Seq(490, 510, 25000).foreach { d =>
      val gate = if (d >= 500) "ON (collapse)" else "OFF (uncollapsed)"
      val opp = Some(if (d >= 500) "1000000000000000000" else "1")
      // interleaved min-of-2 per position (the Bench sweep protocol)
      val (t1, pDef) = timed(d, None)
      val (t2, pOpp) = timed(d, opp)
      val (t3, _) = timed(d, None)
      val (t4, _) = timed(d, opp)
      println(f"extras=$d%4d  default[$gate] ${math.min(t1, t3)}%6.2f s  " +
        f"forced-opposite ${math.min(t2, t4)}%6.2f s  " +
        f"pairs default=$pDef opposite=$pOpp")
      assert(pDef == pOpp, s"pair counts diverge at extras=$d")
    }
    spark.stop()
  }
}
