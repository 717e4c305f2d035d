package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Identical-set group collapse for the DISTRIBUTED prefix-filter
  * family (q133/q143/q165) — the r13 `hammingPairs`/`EmbeddingDedup`
  * collapse, applied to the exact set-similarity plans.
  *
  * Why: on a mass-duplicate corpus (the replicated scale fixtures are
  * the adversarial case) every member of a duplicate group carries the
  * same shingle set, so the prefix-filter candidate join generates
  * dup² candidate pairs per rare shingle and the verify join drags two
  * doc-sized arrays through each — the 30× full-suite sweep filled
  * ~78 GB of spill on q133 alone before this. Collapsing to one
  * representative per distinct set makes candidate volume independent
  * of the duplication factor; member fan-out of PASSING pairs is pure
  * output (identical sets ⇒ identical similarity), so the result is
  * bit-identical to the uncollapsed plan — the same exactness argument
  * pinned for the banded plans by DedupSkewSpec in round 13.
  *
  * Data-adaptive: on a duplicate-free corpus (`countDistinct == count`
  * over a 64-bit key hash — the gate is approximate, the GROUPING is
  * exact) the collapse is skipped entirely; its cost is then one
  * map-side-combined aggregate over the doc relation. Caveat at scale:
  * `collect_list` makes one row per distinct set, so a viral group of
  * k duplicates is a k-element array on one row — fine for any real
  * duplication factor; a corpus where one set has ~10⁸ members needs
  * the star-cap variant (hammingPairs) instead.
  */
object SetGroups {

  /** Group `docArr` by identical `keyCols` (e.g. the sorted distinct
    * shingle array + its size). Returns None when duplicate-free.
    * Some((reps, mem)): `reps` is docArr restricted to one min-id
    * representative per distinct key (same columns, so the caller's
    * pipeline runs over it unchanged); `mem` is the (rep, id)
    * membership relation (rep included as its own member). */
  def collapse(docArr: DataFrame, idCol: String,
               keyCols: Seq[String]): Option[(DataFrame, DataFrame)] = {
    val key = keyCols.map(col)
    val st = docArr
      .agg(count(lit(1)), countDistinct(xxhash64(key: _*))).head()
    // threshold gate (r14 optimization round, shared rule with
    // Dedup.dupCollapseThreshold): this family's uncollapsed plan is
    // EXACT at any duplication (no caps — all-pairs semantics), so the
    // collapse is purely a work trade: dup² candidate/verify savings
    // vs ~6 extra AQE job rounds of group machinery. Below a few
    // hundred duplicate extras the savings are negligible and the
    // overhead dominates (measured +0.7 s/query at sf0.1 for 8
    // duplicate rows); at ScaleTrial replication factors extras ≫
    // threshold and the collapse engages as before.
    if (st.getLong(0) - st.getLong(1) <
        Dedup.dupCollapseThreshold(docArr, 1000)) return None
    // eager: reps feeds the whole candidate pipeline while mem feeds
    // the fan-out joins — concurrent consumers would race a lazy cache
    val g = docArr.groupBy(key: _*)
      .agg(min(col(idCol)).as(idCol), collect_list(col(idCol)).as("_mm"))
      .localCheckpoint()
    val reps = g.select(col(idCol) +: key: _*)
    val mem = g.select(col(idCol).as("rep"), explode(col("_mm")).as("id"))
    Some((reps, mem))
  }
}
