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
             |ORDER BY event_id""".stripMargin)),

    // SCD Type-2 interval build: per-user attribute history as
    // (valid_from, valid_to) rows — change-point detection (lag) →
    // run ids (running sum) → interval close (lead), the standard
    // warehouse temporal-snapshot shape. valid_to is NULL on the
    // current segment.
    Q("q104_scd2_intervals",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = EventQueries.events(s, dir)
          .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val seg = e
          .withColumn("pt", lag(col("event_type"), 1).over(w))
          .withColumn("nf",
            when(col("pt").isNull || col("pt") =!= col("event_type"), 1).otherwise(0))
          .withColumn("seg_seq", sum(col("nf"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast(LongType))
        seg.groupBy(col("user_id"), col("seg_seq"))
          .agg(min(col("event_type")).as("attr"),
            min(col("ts")).as("valid_from"),
            count(lit(1)).cast(LongType).as("n_events"))
          .withColumn("valid_to", lead(col("valid_from"), 1)
            .over(Window.partitionBy(col("user_id")).orderBy(col("seg_seq"))))
          .select(col("user_id"), col("seg_seq"), col("attr"),
            col("valid_from"), col("valid_to"), col("n_events"))
          .orderBy(col("user_id"), col("seg_seq"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type,
             |    CAST(ts AS TIMESTAMP) AS t FROM events),
             |lg AS (SELECT *, LAG(event_type) OVER (PARTITION BY user_id
             |    ORDER BY t, event_id) AS pt FROM e),
             |fl AS (SELECT *, CASE WHEN pt IS NULL OR pt <> event_type
             |    THEN 1 ELSE 0 END AS nf FROM lg),
             |seg AS (SELECT *, CAST(SUM(nf) OVER (PARTITION BY user_id
             |    ORDER BY t, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
             |    AS seg_seq FROM fl),
             |g AS (SELECT user_id, seg_seq, MIN(event_type) AS attr,
             |    MIN(t) AS valid_from, CAST(COUNT(*) AS BIGINT) AS n_events
             |  FROM seg GROUP BY user_id, seg_seq)
             |SELECT user_id, seg_seq, attr, valid_from,
             |  LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY seg_seq)
             |    AS valid_to,
             |  n_events
             |FROM g ORDER BY user_id, seg_seq""".stripMargin)),

    // Ordered conversion funnel (view → click → purchase): each stage
    // keeps users whose stage event happens AT OR AFTER their previous
    // stage's earliest time — three chained per-user min-aggregates,
    // each a shuffle on user_id with map-side combine; stage frames
    // shrink monotonically so the joins broadcast at scale.
    Q("q105_funnel",
      (s, dir) => {
        val ev = EventQueries.events(s, dir)
        val s1 = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
        val s2 = ev.filter(col("event_type") === "click")
          .join(s1, "user_id").filter(col("ts") >= col("t1"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
        val s3 = ev.filter(col("event_type") === "purchase")
          .join(s2, "user_id").filter(col("ts") >= col("t2"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
        s1.agg(count(lit(1)).cast(LongType).as("n_users"))
          .selectExpr("CAST(1 AS BIGINT) AS stage", "'view' AS label", "n_users")
          .unionAll(s2.agg(count(lit(1)).cast(LongType).as("n_users"))
            .selectExpr("CAST(2 AS BIGINT) AS stage",
              "'click_after_view' AS label", "n_users"))
          .unionAll(s3.agg(count(lit(1)).cast(LongType).as("n_users"))
            .selectExpr("CAST(3 AS BIGINT) AS stage",
              "'purchase_after_click' AS label", "n_users"))
          .orderBy(col("stage"))
      },
      Some("""WITH s1 AS (SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t1
             |  FROM events WHERE event_type = 'view' GROUP BY user_id),
             |s2 AS (SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t2
             |  FROM events e JOIN s1 ON e.user_id = s1.user_id
             |  WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) >= s1.t1
             |  GROUP BY e.user_id),
             |s3 AS (SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t3
             |  FROM events e JOIN s2 ON e.user_id = s2.user_id
             |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) >= s2.t2
             |  GROUP BY e.user_id)
             |SELECT * FROM (
             |  SELECT CAST(1 AS BIGINT) AS stage, 'view' AS label,
             |    CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
             |  UNION ALL SELECT CAST(2 AS BIGINT), 'click_after_view',
             |    CAST(COUNT(*) AS BIGINT) FROM s2
             |  UNION ALL SELECT CAST(3 AS BIGINT), 'purchase_after_click',
             |    CAST(COUNT(*) AS BIGINT) FROM s3)
             |ORDER BY stage""".stripMargin)),

    // Per-user EWMA engagement score — the time-decayed feature an
    // event/training pipeline computes as-of "now": fold the user's
    // events in time order, halving the accumulator per whole hour of
    // gap before adding each event's value. Integer-exact: values
    // scale to 1e6 longs, decay is a power-of-two division (values
    // are non-negative so floor and truncating division agree), so
    // both engines replay the recurrence bit-for-bit. The fold is
    // inherently sequential per user, so it runs as an aggregate()
    // over the user's sorted event array — per-user event counts
    // bound the array (hundreds here; at 100 TB this is the operator
    // to re-shard by (user, epoch-window) if a key's history outgrows
    // a task).
    Q("q108_ewma_features",
      (s, dir) => EventQueries.events(s, dir)
        .select(col("user_id"),
          unix_timestamp(col("ts")).as("t"),
          col("event_id").as("id"),
          expr("CAST(round(value * 1e6, 0) AS BIGINT)").as("v"))
        .groupBy(col("user_id"))
        .agg(sort_array(collect_list(struct(col("t"), col("id"), col("v"))))
          .as("seq"),
          count(lit(1)).cast(LongType).as("n_events"))
        .select(col("user_id"),
          expr("""aggregate(slice(seq, 2, greatest(size(seq) - 1, 0)),
            element_at(seq, 1),
            (acc, x) -> named_struct('t', x.t, 'id', x.id,
              'v', acc.v DIV shiftleft(CAST(1 AS BIGINT),
                     CAST(least((x.t - acc.t) DIV 3600, 62) AS INT)) + x.v)).v""")
            .as("ewma_scaled"),
          col("n_events"))
        .orderBy(col("user_id")),
      Some("""WITH e AS (SELECT user_id,
             |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS t,
             |    event_id AS id,
             |    CAST(round(value * 1e6, 0) AS BIGINT) AS v
             |  FROM events),
             |g AS (SELECT user_id,
             |    list_sort(list({'t': t, 'id': id, 'v': v})) AS seq,
             |    CAST(COUNT(*) AS BIGINT) AS n_events
             |  FROM e GROUP BY user_id)
             |SELECT user_id,
             |  list_reduce(seq, (acc, x) -> {'t': x.t, 'id': x.id,
             |    'v': acc.v // CAST(power(2, least((x.t - acc.t) // 3600, CAST(62 AS BIGINT))) AS BIGINT) + x.v}).v
             |    AS ewma_scaled,
             |  n_events
             |FROM g ORDER BY user_id""".stripMargin)),

    // Weekly retention cohorts — the product-analytics matrix every
    // event pipeline ships: users grouped by first-activity week,
    // tracked by distinct active weeks since, with retention as an
    // integer basis-point share of the cohort (scaled DIV — no float
    // division to wobble). Shape: one distinct on (user, week) and
    // one per-user min, both shuffle-on-user_id with map-side
    // combine; the matrix aggregate keys on (cohort, age) — thousands
    // of rows at any corpus size — and cohort sizes broadcast back.
    // Both engines truncate weeks to Monday (date_trunc('week')).
    Q("q112_retention_cohorts",
      (s, dir) => {
        val wk = EventQueries.events(s, dir)
          .select(col("user_id"),
            to_date(date_trunc("week", col("ts"))).as("wk"))
          .distinct()
        val first = wk.groupBy(col("user_id"))
          .agg(min(col("wk")).as("cohort_wk"))
        val sizes = first.groupBy(col("cohort_wk"))
          .agg(count(lit(1)).cast(LongType).as("cohort_users"))
        wk.join(first, "user_id")
          .withColumn("age_weeks",
            (datediff(col("wk"), col("cohort_wk")) / 7)
              .cast(IntegerType).cast(LongType))
          .groupBy(col("cohort_wk"), col("age_weeks"))
          .agg(count(lit(1)).cast(LongType).as("n_active"))
          .join(broadcast(sizes), "cohort_wk")
          .select(col("cohort_wk"), col("age_weeks"), col("n_active"),
            col("cohort_users"),
            expr("n_active * 10000 DIV cohort_users").as("retention_bp"))
          .orderBy(col("cohort_wk"), col("age_weeks"))
      },
      Some("""WITH wk AS (SELECT DISTINCT user_id,
             |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
             |  FROM events),
             |first AS (SELECT user_id, MIN(wk) AS cohort_wk
             |  FROM wk GROUP BY user_id),
             |sizes AS (SELECT cohort_wk,
             |    CAST(COUNT(*) AS BIGINT) AS cohort_users
             |  FROM first GROUP BY cohort_wk),
             |m AS (SELECT f.cohort_wk,
             |    CAST(datediff('day', f.cohort_wk, wk.wk) // 7 AS BIGINT)
             |      AS age_weeks,
             |    CAST(COUNT(*) AS BIGINT) AS n_active
             |  FROM wk JOIN first f ON wk.user_id = f.user_id
             |  GROUP BY 1, 2)
             |SELECT m.cohort_wk, m.age_weeks, m.n_active, s.cohort_users,
             |  m.n_active * 10000 // s.cohort_users AS retention_bp
             |FROM m JOIN sizes s ON m.cohort_wk = s.cohort_wk
             |ORDER BY m.cohort_wk, m.age_weeks""".stripMargin))
  )
}
