package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.StructType

/** The hybrid-switch helper behind the ClusterUnify/PageRank/
  * KMeansTrain/Perceptron convention, for DOMAIN-BOUNDED relations
  * (per-value cell tables, vocab tables, pair lists — state bounded by
  * a value domain, never by the corpus): when the materialized row
  * count is under the threshold, run an exact sequential function over
  * the whole relation in ONE executor task (a coalesced partition —
  * not a driver collect) instead of a multi-stage distributed plan
  * whose per-stage scheduling dominates at that size. Callers keep the
  * distributed plan as the over-threshold path — that plan is the
  * 100-TB design; this is the dispatch that stops paying ten stages to
  * reduce 150k rows.
  */
object LocalExact {

  /** @return Some(result of `f` over all rows, as one task) when
    *         `cells` has ≤ `maxRows` rows, else None (caller falls
    *         through to its distributed plan). `cells` should be
    *         materialized (checkpoint/cache) — the count is re-read. */
  def apply(cells: DataFrame, schema: StructType, maxRows: Long)(
      f: Iterator[Row] => Iterator[Row]): Option[DataFrame] = {
    // spark.graft.localExactMaxRows overrides every caller's threshold
    // — tests set it to 0 to force the distributed path and pin parity
    val limit = cells.sparkSession.conf
      .getOption("spark.graft.localExactMaxRows").map(_.toLong)
      .getOrElse(maxRows)
    if (cells.count() > limit) None
    else Some(cells.sparkSession.createDataFrame(
      cells.coalesce(1).rdd.mapPartitions(f), schema)
      // materialize the one-task result LAZILY: every caller ends in
      // a global orderBy, whose range-sample pass + sort pass would
      // otherwise each re-execute the kernel (2× the sequential
      // work); the sample pass materializes the (output-sized, tiny)
      // blocks and the sort pass re-reads them — lazy so query
      // CONSTRUCTION doesn't pay a synchronous job barrier
      .localCheckpoint(eager = false))
  }
}
