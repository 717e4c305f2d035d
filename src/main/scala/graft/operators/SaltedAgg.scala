package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant two-phase aggregation: salt the hot key space,
  * pre-aggregate per (key, salt), then combine — the classic fix when
  * a handful of keys carry most of a 100 TB table and one reducer
  * would otherwise take the whole shuffle partition (SURVEY §4 /
  * "Optimize for scale" brief; AQE's skew handling covers joins but
  * not single-key aggregation hotspots).
  *
  * Results are exactly the plain groupBy for any algebraic aggregate
  * (sum/count/min/max — decimal sums stay exact, so the salted plan is
  * value-identical, not just approximately equal).
  */
object SaltedAgg {

  /** Deterministic salt from a unique column (NOT rand(): keeps plans
    * replayable and speculative-task-safe). */
  def saltFrom(unique: Column, buckets: Int): Column =
    pmod(hash(unique), lit(buckets))

  /** groupBy(keys).agg(sum(valueCol)) with salted pre-aggregation.
    * `uniqueCol` supplies the salt entropy. */
  def sumByKey(df: DataFrame, keys: Seq[String], valueCol: Column,
               alias: String, uniqueCol: Column, buckets: Int = 16): DataFrame = {
    val pre = df
      .withColumn("_salt", saltFrom(uniqueCol, buckets))
      .groupBy(keys.map(col) :+ col("_salt"): _*)
      .agg(sum(valueCol).as("_partial"), count(lit(1)).as("_pn"))
    pre.groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as(alias), sum(col("_pn")).as(s"${alias}_n"))
  }
}
