package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event log — batch analog of
  * Structured Streaming's `session_window` (the streaming variant lives
  * in graft.streaming.EventStreams). The reference has no event-time
  * windowing (SURVEY §2.9); this is north-star engine surface exercised
  * by the driver `events` table.
  *
  * Single shuffle on the user key; the lag/cumsum windows then run
  * partition-local. Ordering includes the unique event id so results
  * are deterministic under timestamp ties.
  */
object Sessionize {
  def apply(events: DataFrame, userCol: String, tsCol: String,
            idCol: String, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val withGap = events
      .withColumn("_prev_ts", lag(col(tsCol), 1).over(byUser))
      .withColumn("_new_session",
        when(col("_prev_ts").isNull ||
          unix_timestamp(col(tsCol)) - unix_timestamp(col("_prev_ts")) > gapSeconds, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("_new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withGap
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
  }
}
