package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the most recent right row with
  * `rightTs <= leftTs` on the same key — the temporal lookup every
  * event/training-data pipeline needs (feature state as of example
  * time) and one Spark's built-ins don't express directly.
  *
  * Implemented as the union-tag trick: tag right rows 0 / left rows 1,
  * sort per key by (ts, tag, tiebreak), and carry the last-seen right
  * payload forward with `last(..., ignoreNulls)` over a running
  * window. ONE shuffle on the key — no range join, no per-row probe —
  * and ties at equal timestamps resolve right-before-left ("at or
  * before") with a deterministic id tiebreak (SURVEY §7.4).
  *
  * At scale this is the sort-merge-friendly formulation: both sides
  * shuffle once on the key and the window is a linear scan per key —
  * the same shape a custom SparkPlan would produce, without leaving
  * the optimizer's planning space.
  */
object AsOfJoin {

  /** @param left      probe side (keeps all rows)
    * @param right     reference side, columns renamed with `r_` prefix
    *                  in the output payload
    * @param key       equi-key column name (same on both sides)
    * @param leftTs    event-time column on left
    * @param rightTs   event-time column on right
    * @param rightCols payload columns from right to carry (prefixed r_)
    * @param rightId   unique right id for deterministic tie-breaks */
  def apply(left: DataFrame, right: DataFrame, key: String,
            leftTs: String, rightTs: String,
            rightCols: Seq[String], rightId: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_rid", lit(null).cast("long"))
    val payloadNull = rightCols.foldLeft(l) { (df, c) =>
      df.withColumn(s"_p_$c", lit(null).cast(right.schema(c).dataType))
    }
    val r0 = right
      .withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(0))
      .withColumn("_rid", col(rightId).cast("long"))
    val rPayload = rightCols.foldLeft(r0)((df, c) => df.withColumn(s"_p_$c", col(c)))
      .select((Seq(key, "_ts", "_side", "_rid") ++ rightCols.map("_p_" + _)).map(col): _*)
    val lAll = payloadNull
      .select((leftCols ++ Seq("_ts", "_side", "_rid") ++ rightCols.map("_p_" + _)).map(col): _*)

    val unioned = lAll.unionByName(rPayload.select(
      lAll.columns.toSeq.map(c =>
        if (rPayload.columns.contains(c)) col(c)
        else lit(null).cast(lAll.schema(c).dataType).as(c)): _*))

    val w = Window.partitionBy(col(key))
      .orderBy(col("_ts"), col("_side"), col("_rid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Carry the whole latest right row as ONE struct so its NULL fields
    // come along atomically — per-column last(ignoreNulls) would
    // backfill a NULL field from an older right row.
    val carried = unioned.withColumn("_pstruct",
      last(when(col("_side") === 0,
        struct(rightCols.map(c => col(s"_p_$c").as(c)): _*)),
        ignoreNulls = true).over(w))
    carried.filter(col("_side") === 1)
      .select(leftCols.map(col) ++ rightCols.map(c => col(s"_pstruct.$c").as(s"r_$c")): _*)
  }
}
