package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline): rows not dominated on
  * (minimize `minCol`, maximize `maxCol`). A row p is dominated iff
  * some q has q.min <= p.min ∧ q.max >= p.max with at least one
  * strict; coordinate ties both survive (no strict edge).
  *
  * The naive formulation is all-pairs NOT EXISTS — O(n²) and a
  * cross-join at scale. The 2-D structure admits the sort-scan
  * algorithm instead (Börzsönyi et al., "The Skyline Operator",
  * ICDE 2001, §3 — public): group to one row per distinct `minCol`
  * (its max of `maxCol`), then a single running max over the
  * `minCol` order decides every group — a point is on the frontier
  * iff it holds its group's max AND strictly exceeds the running max
  * of all strictly-smaller groups. The running max uses the same
  * two-phase parallel-scan shape as [[PrefixSum]] (range partition →
  * per-partition window → O(numParts) offset frame broadcast back),
  * so no row-count-sized data ever funnels through one task —
  * O(n log n) total work, two shuffles, skyline at 100 TB.
  */
object Skyline {

  /** @return the rows of `df` on the (min `minCol`, max `maxCol`)
    *         Pareto frontier. Nulls in either column are excluded. */
  def apply(df: DataFrame, minCol: String, maxCol: String,
            numParts: Int = 0): DataFrame = {
    val n = if (numParts > 0) numParts
            else df.sparkSession.sparkContext.defaultParallelism
    val in = df.filter(col(minCol).isNotNull && col(maxCol).isNotNull)
    // one row per distinct minCol value — the group's best maxCol
    val g = in.groupBy(col(minCol)).agg(max(col(maxCol)).as("_gmax"))
    val parted = g.repartitionByRange(n, col(minCol))
      .withColumn("_pid", spark_partition_id())
    // per-partition running max over strictly-preceding groups
    val wLocal = Window.partitionBy(col("_pid")).orderBy(col(minCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = parted.withColumn("_lprev", max(col("_gmax")).over(wLocal))
      .localCheckpoint() // feeds both the totals frame and the filter
    val totals = local.groupBy(col("_pid")).agg(max(col("_gmax")).as("_pmax"))
    // exclusive prefix-max over the PARTITION COUNT — the only
    // non-parallel step, bounded by numParts, never by the data
    val wOff = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("_prevmax", max(col("_pmax")).over(wOff))
      .select(col("_pid"), col("_prevmax"))
    // greatest() skips nulls (first partition / first row have no
    // predecessor); frontier groups strictly exceed every
    // strictly-cheaper group's best
    val frontier = local.join(broadcast(offsets), "_pid")
      .withColumn("_prev", greatest(col("_lprev"), col("_prevmax")))
      .filter(col("_prev").isNull || col("_prev") < col("_gmax"))
      .select(col(minCol).as("_fmin"), col("_gmax"))
    // all original rows holding a frontier coordinate survive —
    // coordinate duplicates included (neither dominates the other)
    in.join(frontier,
      in(minCol) === col("_fmin") && in(maxCol) === col("_gmax"))
      .drop("_fmin", "_gmax")
  }
}
