package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global prefix sum (running total in a total order) —
  * the two-phase scan primitive: an ORDER BY window with no PARTITION
  * BY funnels every row through one task, so instead
  *
  *  1. range-partition by the order column (partition i's keys all
  *     precede partition i+1's),
  *  2. per-partition running sum (window keyed by the physical
  *     partition id — each range partition is one window group),
  *  3. per-partition totals → exclusive prefix over the PARTITION
  *     COUNT (a ~numParts-row frame, the only non-parallel step),
  *     broadcast back and added as offsets.
  *
  * Driver/executor asymmetry is the point: the sequential step is
  * O(numParts), not O(rows) — the textbook parallel-scan shape, and
  * the same trick Spark's own FileScan uses to plan byte splits.
  * Used by q84_compaction_plan to derive the deterministic bin-pack
  * plan that [[Compaction]] executes physically.
  */
object PrefixSum {

  /** @return `df` + `outCol` = running total of `valueCol` ordered by
    *         `orderCol` (inclusive of the current row). `orderCol`
    *         must be a total order (unique keys) for a deterministic
    *         result. */
  def apply(df: DataFrame, orderCol: String, valueCol: String,
            outCol: String = "cum", numParts: Int = 0): DataFrame = {
    val n = if (numParts > 0) numParts
            else df.sparkSession.sparkContext.defaultParallelism
    val parted = df.repartitionByRange(n, col(orderCol))
      .withColumn("_pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("_pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE materialized RDD feeds both the totals branch and the final
    // join. This is load-bearing for correctness, not just cost:
    // spark_partition_id() is only consistent across consumers when
    // they read the SAME RDD — two separate reads of the range
    // exchange can be coalesced differently by AQE, silently
    // renumbering partitions in one branch and corrupting the offsets
    // (observed on q146/q150). LAZY checkpoint (eager = false) keeps
    // that single-RDD guarantee without the per-call job barrier the
    // eager form paid — queries composing several prefix sums (q155's
    // three bucket pipelines) materialize them inside one job instead
    // of serializing driver-side.
    val local = parted.withColumn("_local", sum(col(valueCol)).over(wLocal))
      .localCheckpoint(eager = false)
    val totals = local.groupBy(col("_pid"))
      .agg(sum(col(valueCol)).as("_ptot"))
    // exclusive prefix over numParts rows — the single-task window is
    // bounded by the partition count, never by the data
    val wOff = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("_off", coalesce(sum(col("_ptot")).over(wOff), lit(0L)))
      .select(col("_pid"), col("_off"))
    local.join(broadcast(offsets), "_pid")
      .withColumn(outCol, col("_local") + col("_off"))
      .drop("_pid", "_local", "_off")
  }

  /** Per-group running totals in ONE machine: `outCol` = running sum
    * of `valueCol` within each `groupCol` value, ordered by
    * `orderCol`. Equivalent to one [[apply]] per group but pays the
    * range-sampling job, the checkpoint, and the totals/offset stages
    * ONCE — q155 composes three dimension-wise prefix sums and
    * serialized three of everything through the driver before this.
    * Same two-phase scan: range-partition on (group, order) so a
    * group's rows appear in order across consecutive partitions, sum
    * locally per (partition, group), then offset by the preceding
    * partitions' totals OF THE SAME GROUP (a numParts × |groups| frame
    * windowed per group — still bounded by the partition count, never
    * by the data). */
  def grouped(df: DataFrame, groupCol: String, orderCol: String,
              valueCol: String, outCol: String = "cum",
              numParts: Int = 0): DataFrame = {
    val n = if (numParts > 0) numParts
            else df.sparkSession.sparkContext.defaultParallelism
    val parted = df.repartitionByRange(n, col(groupCol), col(orderCol))
      .withColumn("_pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("_pid"), col(groupCol))
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // same single-RDD guarantee as apply(): _pid must agree between
    // the totals branch and the final join
    val local = parted.withColumn("_local", sum(col(valueCol)).over(wLocal))
      .localCheckpoint(eager = false)
    val totals = local.groupBy(col("_pid"), col(groupCol))
      .agg(sum(col(valueCol)).as("_ptot"))
    val wOff = Window.partitionBy(col(groupCol)).orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("_off", coalesce(sum(col("_ptot")).over(wOff), lit(0L)))
      .select(col("_pid"), col(groupCol), col("_off"))
    local.join(broadcast(offsets), Seq("_pid", groupCol))
      .withColumn(outCol, col("_local") + col("_off"))
      .drop("_pid", "_local", "_off")
  }
}
