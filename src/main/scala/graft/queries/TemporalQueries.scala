package graft.queries

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Temporal/statistical event operators: as-of join (feature state as
  * of event time) and exact-arithmetic z-score outlier detection.
  * DuckDB's native ASOF JOIN serves as the oracle for the former.
  */
object TemporalQueries {

  val all: Seq[Q] = Seq(

    // As-of join: each purchase looks up the user's most recent view
    // at or before it. Right side deduped per (user, ts) so the
    // tie-break is unambiguous on both engines.
    Q("q53_asof_join",
      (s, dir) => {
        val ev = EventQueries.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val views = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("event_id")).as("view_id"))
        AsOfJoin(purchases, views, key = "user_id",
          leftTs = "ts", rightTs = "ts",
          rightCols = Seq("view_id"), rightId = "view_id")
          .select(col("event_id"), col("user_id"), col("r_view_id").as("view_id"))
          .orderBy(col("event_id"))
      },
      Some("""WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
             |  FROM events WHERE event_type = 'purchase'),
             |v AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             |    MAX(event_id) AS view_id
             |  FROM events WHERE event_type = 'view' GROUP BY user_id, CAST(ts AS TIMESTAMP))
             |SELECT p.event_id, p.user_id, v.view_id
             |FROM p ASOF LEFT JOIN v
             |  ON p.user_id = v.user_id AND v.ts <= p.ts
             |ORDER BY p.event_id""".stripMargin)),

    // Per-type z-score outliers with mean/std derived from exact
    // decimal sums (sum, sum of squares) — deterministic double math,
    // no stddev_samp aggregation-order wobble.
    Q("q54_zscore_outliers",
      (s, dir) => {
        val ev = EventQueries.events(s, dir)
        val stats = ev.groupBy(col("event_type"))
          .agg(
            sum(col("value").cast(DecimalType(24, 6))).cast(DoubleType).as("_sum"),
            sum((col("value") * col("value")).cast(DecimalType(30, 6)))
              .cast(DoubleType).as("_sumsq"),
            count(lit(1)).as("_n"))
          .withColumn("_mean", col("_sum") / col("_n"))
          .withColumn("_var",
            (col("_sumsq") - col("_sum") * col("_sum") / col("_n")) / (col("_n") - 1))
        ev.join(broadcast(stats), "event_type")
          .withColumn("z", (col("value") - col("_mean")) / sqrt(col("_var")))
          .filter(abs(col("z")) > 2.5)
          .select(col("event_id"), col("event_type"), col("value"),
            round(col("z"), 6).as("z"))
          .orderBy(col("event_id"))
      },
      Some("""WITH stats AS (SELECT event_type,
             |    CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS s,
             |    CAST(SUM(CAST(value * value AS DECIMAL(30,6))) AS DOUBLE) AS sq,
             |    COUNT(*) AS n
             |  FROM events GROUP BY event_type),
             |st2 AS (SELECT event_type, s / n AS mean,
             |    (sq - s * s / n) / (n - 1) AS var FROM stats)
             |SELECT event_id, e.event_type, value,
             |  round((value - mean) / sqrt(var), 6) AS z
             |FROM events e JOIN st2 ON e.event_type = st2.event_type
             |WHERE abs((value - mean) / sqrt(var)) > 2.5
             |ORDER BY event_id""".stripMargin))
  )
}
