package graft.queries

import graft.operators.Multimodal
import graft.util.Tables
import org.apache.spark.sql.functions._

/** J8/U3 + token budgeting: object-store ⋈ registry reconciliation
  * — the reference walks the image tree and diffs it against DB hashes
  * at directory and file level (image_garbage_collector.py:46-122).
  * Here: a synthetic "disk listing" (every asset's hashed path) is
  * anti-joined against a "registry" missing every 10th asset — the
  * orphans — plus the A8 reclaimed-bytes rollup, in one plan.
  */
object GcQueries {

  val all: Seq[Q] = Seq(
    Q("q49_gc_orphans",
      (s, dir) => {
        val assets = Multimodal.withContentStats(
          Multimodal.syntheticAssets(s, dir).toDF())
          .withColumn("path", Multimodal.storagePath(
            col("client_id"), (col("asset_id") % 100).cast("string"),
            col("content_hash")))
        val disk = assets.select(col("asset_id"), col("client_id"),
          col("path"), col("byte_size"))
        val registry = assets.filter(col("asset_id") % 10 =!= 0)
          .select(col("path"))
        disk.join(registry, Seq("path"), "left_anti")
          .groupBy(col("client_id"))
          .agg(count(lit(1)).as("n_orphans"),
            sum(col("byte_size")).as("bytes_reclaimed"))
          .orderBy(col("client_id"))
      },
      Some("""WITH assets AS (SELECT doc_id AS asset_id,
             |    'client_' || CAST(doc_id % 5 AS VARCHAR) AS client_id,
             |    CAST(strlen(text) AS INT) AS byte_size
             |  FROM documents)
             |SELECT client_id, COUNT(*) AS n_orphans,
             |  CAST(SUM(byte_size) AS BIGINT) AS bytes_reclaimed
             |FROM assets WHERE asset_id % 10 = 0
             |GROUP BY client_id ORDER BY client_id""".stripMargin)),

    // Token counting: whitespace + BPE-ish subword pre-tokenizer —
    // the LLM token-budget signal of the training-data pipeline.
    Q("q50_token_counts",
      (s, dir) => Tables(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.TextFns.tokenCount(col("text")).as("ws_tokens"),
          graft.functions.TextFns.bpeTokenCount(col("text")).as("bpe_tokens"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
             |  len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS ws_tokens,
             |  len(regexp_extract_all(text, '${graft.functions.TextFns.BpePattern}')) AS bpe_tokens
             |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
