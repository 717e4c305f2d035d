package graft.queries

import graft.operators.{CdcDelta, Sessionize}
import graft.util.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-stream surface (SURVEY §2.9): JSON extraction, event-time
  * tumbling windows, gap sessionization, CDC delta — batch forms here;
  * the Structured Streaming variants live in graft.streaming.
  *
  * The driver's `events.parquet` carries TIMESTAMP(NANOS), which Spark
  * deliberately does not map to its µs TimestampType; we read nanos as
  * long (legacy conf) and floor-convert with integer division — exactly
  * what the DuckDB oracle's TIMESTAMP_NS → TIMESTAMP cast does.
  */
object EventQueries {

  /** events with `ts` as µs TimestampType (exact floor of the ns value). */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables(s, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  val all: Seq[Q] = Seq(

    // F14 JSON extraction + aggregation (JSONB ->> casts,
    // loader_v2.py:167-175) over the props JSON column.
    Q("q14_json_extract",
      (s, dir) => events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, COUNT(*) AS n,
             |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
             |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Event-time tumbling window aggregation (engine surface for
    // ST1-ST4; streaming twin uses the same window() call under
    // watermark — see graft.streaming.EventStreams).
    Q("q15_hourly_windows",
      (s, dir) => events(s, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
        .select(col("w.start").as("hour_start"), col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("hour_start"), col("event_type")),
      Some("""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start, event_type,
             |  COUNT(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin),
      headline = true),

    // Gap-based sessionization (session_window analog).
    Q("q16_sessionize",
      (s, dir) => Sessionize(events(s, dir), "user_id", "ts", "event_id", 1800L)
        .orderBy(col("user_id"), col("session_seq")),
      Some("""WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t FROM events),
             |lagd AS (SELECT *, lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS pt FROM e),
             |flag AS (SELECT *, CASE WHEN pt IS NULL OR
             |    CAST(floor(epoch(t)) AS BIGINT) - CAST(floor(epoch(pt)) AS BIGINT) > 1800
             |  THEN 1 ELSE 0 END AS nf FROM lagd),
             |sess AS (SELECT *, SUM(nf) OVER (PARTITION BY user_id ORDER BY t, event_id
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sseq FROM flag)
             |SELECT user_id, CAST(sseq AS BIGINT) AS session_seq,
             |  MIN(t) AS session_start, MAX(t) AS session_end, COUNT(*) AS n_events
             |FROM sess GROUP BY user_id, sseq
             |ORDER BY user_id, session_seq""".stripMargin)),

    // J5 incremental-sync delta with 60 s clock-skew tolerance
    // (run_ingest.py:81-87 + base_provider.py:111-174): which clicks
    // happened after the user's last known view?
    Q("q17_cdc_delta",
      (s, dir) => {
        val ev = events(s, dir)
        val source = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val known = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(max(col("ts")).as("last_ts"))
        CdcDelta(source, known, Seq("user_id"), "ts", "last_ts", 60L)
          .select(col("event_id"), col("user_id"), col("change_type"))
          .orderBy(col("event_id"))
      },
      Some("""WITH src AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
             |  FROM events WHERE event_type = 'click'),
             |st AS (SELECT user_id, MAX(CAST(ts AS TIMESTAMP)) AS last_ts
             |  FROM events WHERE event_type = 'view' GROUP BY user_id)
             |SELECT event_id, src.user_id,
             |  CASE WHEN last_ts IS NULL THEN 'new' ELSE 'updated' END AS change_type
             |FROM src LEFT JOIN st ON src.user_id = st.user_id
             |WHERE last_ts IS NULL
             |   OR CAST(floor(epoch(ts)) AS BIGINT) > CAST(floor(epoch(last_ts)) AS BIGINT) + 60
             |ORDER BY event_id""".stripMargin))
  )
}
