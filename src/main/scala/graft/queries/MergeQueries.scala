package graft.queries

import graft.operators.MergeUpsert
import graft.util.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** K2/K3: hash-gated MERGE/UPSERT with soft delete, exercised on a
  * deterministic target/batch split of `orders`:
  *  - target = keys with k % 4 != 0 (plus content hash)
  *  - batch  = even keys; rows with k % 8 == 2 get a price bump
  * ⇒ inserts (k%4==0), updates (k%8==2), keeps (k%8==6 and even k in
  * both with same hash), soft deletes (odd k). Mirrors
  * loader_v2.py:158-220's ON CONFLICT + hash gate + NOT-IN-batch
  * delete as one full-outer merge.
  */
object MergeQueries {

  val all: Seq[Q] = Seq(
    Q("q31_merge_upsert",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        def hashed(df: org.apache.spark.sql.DataFrame) = df.withColumn("hash",
          sha2(concat_ws("|", col("status"),
            col("totalprice").cast(DecimalType(18, 2)).cast(StringType)), 256))
        val target = hashed(o.filter(col("o_orderkey") % 4 =!= 0)
          .select(col("o_orderkey"), col("o_orderstatus").as("status"),
            col("o_totalprice").as("totalprice")))
        val batch = hashed(o.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), col("o_orderstatus").as("status"),
            when(col("o_orderkey") % 8 === 2, col("o_totalprice") + 1000d)
              .otherwise(col("o_totalprice")).as("totalprice")))
        MergeUpsert(target, batch, Seq("o_orderkey"), "hash", softDelete = true)
          .select(col("o_orderkey"), col("status"), col("totalprice"), col("merge_action"))
          .orderBy(col("o_orderkey"))
      },
      Some("""WITH t AS (SELECT o_orderkey AS k, o_orderstatus AS status, o_totalprice AS tp,
             |    sha256(o_orderstatus || '|' || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)) AS h
             |  FROM orders WHERE o_orderkey % 4 <> 0),
             |b AS (SELECT o_orderkey AS k, o_orderstatus AS status,
             |    CASE WHEN o_orderkey % 8 = 2 THEN o_totalprice + 1000 ELSE o_totalprice END AS tp
             |  FROM orders WHERE o_orderkey % 2 = 0),
             |b2 AS (SELECT k, status, tp,
             |    sha256(status || '|' || CAST(CAST(tp AS DECIMAL(18,2)) AS VARCHAR)) AS h
             |  FROM b)
             |SELECT COALESCE(t.k, b2.k) AS o_orderkey,
             |  CASE WHEN t.k IS NULL THEN b2.status
             |       WHEN b2.k IS NULL THEN 'deleted'
             |       WHEN b2.h IS DISTINCT FROM t.h THEN b2.status
             |       ELSE t.status END AS status,
             |  CASE WHEN t.k IS NULL THEN b2.tp
             |       WHEN b2.k IS NOT NULL AND b2.h IS DISTINCT FROM t.h THEN b2.tp
             |       ELSE t.tp END AS totalprice,
             |  CASE WHEN t.k IS NULL THEN 'insert'
             |       WHEN b2.k IS NULL THEN 'delete'
             |       WHEN b2.h IS NOT DISTINCT FROM t.h THEN 'keep'
             |       ELSE 'update' END AS merge_action
             |FROM t FULL OUTER JOIN b2 ON t.k = b2.k
             |ORDER BY o_orderkey""".stripMargin))
  )
}
