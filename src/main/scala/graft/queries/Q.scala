package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine query: a Spark implementation over the test
  * tables plus (when SQL-expressible) an equivalent DuckDB oracle.
  * Column names/aliases MUST match between the two — the driver's
  * compare sorts columns by name and hash-compares values.
  *
  * Determinism rules applied across the registry (see SURVEY §7.4):
  *  - every query ends in a total ORDER BY over a unique key set;
  *  - double aggregates go through exact decimal (or scaled-long)
  *    accumulation so partial-aggregation order can't change results;
  *  - rounding always uses round() (HALF_UP, matches DuckDB for the
  *    positive/negative away-from-zero cases) — never double→decimal
  *    casts at scale 0 and never bare double→int casts in the oracle
  *    (DuckDB casts are half-even).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false,
    // true = the query fn executes a real micro-batch streaming
    // pipeline (state stores, per-batch scheduling) whose DuckDB
    // oracle is an equivalent BATCH query — different work, same
    // answer. Bench publishes this per query so the batch-only vs
    // streaming split of the comparator is computed, not narrated.
    streaming: Boolean = false)

object Registry {
  lazy val all: Seq[Q] =
    CoreQueries.all ++ EventQueries.all ++ TextQueries.all ++
      VectorQueries.all ++ GeoQueries.all ++ MergeQueries.all ++
      ExtraQueries.all ++ DomainQueries.all ++ MultimodalQueries.all ++
      ScaleQueries.all ++ GcQueries.all ++ TemporalQueries.all ++
      CleanQueries.all ++ SurfaceQueries.all ++ StreamQueries.all ++
      GraphQueries.all ++ RetrievalQueries.all ++ ProfileQueries.all ++
      CurationQueries.all

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
