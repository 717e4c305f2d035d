package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hash-gated MERGE/UPSERT + soft delete over immutable columnar
  * storage — the reference's `INSERT … ON CONFLICT DO UPDATE … WHERE
  * hash IS DISTINCT FROM EXCLUDED.hash` plus the batch-absent soft
  * delete (reference: src/ETL_PROPERTIES/loader_v2.py:158-220;
  * src/shared/vector_store.py:109-205).
  *
  * With no transactional table format available, MERGE over Parquet is
  * a full-outer join on the natural key + per-row action resolution —
  * one shuffle on the key, then a partition-parallel rewrite. At scale,
  * partition both sides by the same key (bucketing) so the join is
  * co-located, and write partitioned by a stable dimension (the
  * reference partitions everything by client_id, SURVEY §4).
  */
object MergeUpsert {

  /** Merge `batch` into `target` on `keys`.
    *  - key only in batch            → inserted  (action 'insert')
    *  - key in both, hash differs    → batch row (action 'update')
    *  - key in both, hash equal      → target row (action 'keep')
    *  - key only in target           → target row, status soft-set to
    *    'deleted' when softDelete (action 'delete')
    * Both sides must share the same schema including `hashCol` and a
    * `status` column when softDelete is on.
    */
  def apply(target: DataFrame, batch: DataFrame, keys: Seq[String],
            hashCol: String, softDelete: Boolean = true): DataFrame = {
    val dataCols = target.columns.filterNot(keys.contains).toSeq
    val t = target.select(
      keys.map(col) :+ struct(dataCols.map(col): _*).as("_t"): _*)
    val b = batch.select(
      keys.map(col) :+ struct(dataCols.map(col): _*).as("_b"): _*)

    val joined = t.join(b, keys, "full_outer")
    val action =
      when(col("_t").isNull, lit("insert"))
        .when(col("_b").isNull, if (softDelete) lit("delete") else lit("keep"))
        // null-safe: NULL hash = NULL hash is "not distinct" → keep,
        // matching the reference's IS DISTINCT FROM semantics
        .when(col(s"_b.$hashCol") <=> col(s"_t.$hashCol"), lit("keep"))
        .otherwise(lit("update"))

    val merged = joined.withColumn("_action", action)
    val outCols = dataCols.map { c =>
      val base = when(col("_action") === "insert" || col("_action") === "update",
        col(s"_b.$c")).otherwise(col(s"_t.$c"))
      val v = if (softDelete && c == "status")
        when(col("_action") === "delete", lit("deleted")).otherwise(base)
      else base
      v.as(c)
    }
    merged.select(keys.map(col) ++ outCols :+ col("_action").as("merge_action"): _*)
  }
}
