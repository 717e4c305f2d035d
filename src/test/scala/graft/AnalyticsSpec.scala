package graft

import graft.queries.Registry
import org.apache.spark.sql.functions._

/** Brute-force cross-checks for the event-analytics family
  * (q146/q148/q149/q150) — in-memory recomputations over the sf0.001
  * events that verify the distributed formulations (spine windows,
  * prefix-sum sweeps, first-seen conversion) against the naive
  * definition.
  */
class AnalyticsSpec extends SparkSpec {

  private def rows(name: String) =
    Registry.byName(name).run(spark, sf001).collect().toSeq

  private lazy val events: Seq[(Long, Long, Long)] = // (event_id, user, t_us)
    spark.read.parquet(s"$sf001/events.parquet")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  /** q16's session definition, naively: per user, sort by (t, id),
    * break when the SECOND-granularity gap exceeds 1800 s. */
  private lazy val sessions: Seq[(Long, Long)] = // (s0_us, s1_us)
    events.groupBy(_._2).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._3, e._1))
      val groups = scala.collection.mutable.ListBuffer(
        scala.collection.mutable.ListBuffer(sorted.head))
      sorted.tail.foreach { e =>
        if (e._3 / 1000000L - groups.last.last._3 / 1000000L > 1800L)
          groups += scala.collection.mutable.ListBuffer(e)
        else groups.last += e
      }
      groups.map(g => (g.head._3, g.last._3))
    }.toSeq

  test("q150 max concurrency equals the brute-force sweep over all " +
    "session endpoints") {
    val Seq(r) = rows("q150_max_concurrency")
    val endpoints = sessions.flatMap(s => Seq(s._1, s._2 + 1)).distinct.sorted
    val conc = endpoints.map(t =>
      t -> sessions.count(s => s._1 <= t && t <= s._2).toLong)
    val mx = conc.map(_._2).max
    val atUs = conc.collectFirst { case (t, c) if c == mx => t }.get
    assert(r.getLong(0) === mx)
    assert(r.getLong(1) === atUs)
  }

  test("q148 growth curve: new_users sums to distinct users and the " +
    "final cumulative equals it") {
    val got = rows("q148_cumulative_distinct")
    val distinctUsers = events.map(_._2).distinct.size.toLong
    assert(got.map(_.getLong(1)).sum === distinctUsers)
    assert(got.last.getLong(2) === distinctUsers)
    // cumulative is the running sum of new_users
    val runningSums = got.map(_.getLong(1)).scanLeft(0L)(_ + _).tail
    assert(got.map(_.getLong(2)) === runningSums)
  }

  test("q146 drift table: bucket counts partition both periods and " +
    "shares sum to ~10000 bp") {
    val got = rows("q146_psi_drift")
    val cut = java.time.Instant.parse("2024-01-16T00:00:00Z")
      .toEpochMilli * 1000L
    val nA = events.count(_._3 < cut).toLong
    val nB = events.count(_._3 >= cut).toLong
    assert(got.map(_.getLong(1)).sum === nA)
    assert(got.map(_.getLong(2)).sum === nB)
    // floor division loses at most 1 bp per bucket
    val shareA = got.map(_.getLong(3)).sum
    assert(shareA <= 10000L && shareA >= 10000L - got.size)
    // baseline deciles: every A bucket holds between floor and ceil
    // of nA/10 (exact-decile property, ties excepted — values are
    // micro-unit-distinct here so the bound is tight)
    got.map(_.getLong(1)).foreach { c =>
      assert(c >= nA / 10 - 1 && c <= nA / 10 + 2)
    }
  }

  test("q149 burst rows match the in-memory dense-spine recomputation") {
    val df = spark.read.parquet(s"$sf001/events.parquet")
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .groupBy(col("event_type"), col("h")).count()
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
    val got = rows("q149_burst_hours")
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2), r.getLong(3)))
    val byType = df.groupBy(_._1)
    val hourMs = 3600000L
    val h0 = df.map(_._2).min
    val h1 = df.map(_._2).max
    val want = byType.toSeq.flatMap { case (et, rows0) =>
      val m = rows0.map(r => r._2 -> r._3).toMap
      val spine = (h0 to h1 by hourMs).map(h => h -> m.getOrElse(h, 0L))
      spine.zipWithIndex.flatMap { case ((h, c), i) =>
        val prev7 = spine.slice(math.max(0, i - 7), i).map(_._2).sum
        if (i >= 7 && c * 7 > prev7 * 2) Some((et, h, c, prev7)) else None
      }
    }.sortBy(x => (x._1, x._2))
    assert(got === want)
  }
}
