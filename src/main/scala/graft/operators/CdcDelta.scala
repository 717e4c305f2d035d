package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental-sync delta join (CDC): decide which source rows need
  * (re-)extraction given the target's known `(key → last_updated)`
  * state, with a clock-skew tolerance — the reference's listing-vs-
  * known-state comparison with its 60 s tolerance (reference:
  * src/ETL_PROPERTIES/run_ingest.py:81-87 +
  * providers/base_provider.py:111-174).
  *
  * A left join on the key + timestamp predicate: new keys (no target
  * row) and keys whose source timestamp exceeds target + tolerance are
  * emitted. One shuffle; broadcast the known-state side when it is a
  * compact (key, ts) projection — which it always is, even at 100 TB of
  * source payload, because the state is two thin columns.
  */
object CdcDelta {
  def apply(source: DataFrame, knownState: DataFrame, keys: Seq[String],
            srcTs: String, tgtTs: String, toleranceSeconds: Long): DataFrame = {
    val state = knownState.select(keys.map(col) :+ col(tgtTs): _*)
    source.join(state, keys, "left")
      .withColumn("change_type",
        when(col(tgtTs).isNull, lit("new"))
          .when(unix_timestamp(col(srcTs)) >
            unix_timestamp(col(tgtTs)) + toleranceSeconds, lit("updated"))
          .otherwise(lit("unchanged")))
      .filter(col("change_type") =!= "unchanged")
      .drop(tgtTs)
  }
}
