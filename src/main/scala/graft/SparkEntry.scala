package graft

import graft.queries.Registry
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The queryable surface lives in graft.queries.Registry; each entry
  * pairs a Spark implementation with (when SQL-expressible) a DuckDB
  * oracle over the same test tables with identical column aliases.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The lead-prep walkability aggregate (SURVEY §7.2): geo
    * radius join + per-property aggregation in one distributed job. */
  def entry(spark: SparkSession): DataFrame =
    Registry.byName("q30_walkability").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Queries whose fn executes a real micro-batch streaming pipeline
    * (the oracle is an equivalent BATCH query — different work, same
    * answer). Bench publishes the split so batch-only comparator
    * ratios are computed, not narrated. */
  def streamingQueries: Set[String] =
    Registry.all.filter(_.streaming).map(_.name).toSet
}
