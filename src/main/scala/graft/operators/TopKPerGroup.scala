package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed per-group top-k — the Spark-native replacement for the
  * reference's `ORDER BY … LIMIT n` executed once per (property,
  * category) round-trip (reference: src/ETL_POIS/cl_test1.py:90-98,
  * 149-157, 203-204 — an N+1 pattern). One window over a single shuffle
  * on the group keys handles EVERY group in one job; at 100 TB this is
  * a single exchange instead of millions of point queries.
  *
  * Callers must pass a fully deterministic ordering (include a unique
  * tie-breaker column) — see SURVEY §7.4 on non-determinism.
  */
object TopKPerGroup {
  def apply(df: DataFrame, groupBy: Seq[Column], orderBy: Seq[Column],
            k: Int, rankCol: String = "rnk"): DataFrame = {
    val w = Window.partitionBy(groupBy: _*).orderBy(orderBy: _*)
    df.withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= k)
  }
}
