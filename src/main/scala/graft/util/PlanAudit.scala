package graft.util

import graft.queries.Registry
import org.apache.spark.sql.SparkSession

/** Plan-quality audit: for every registry query, flag cartesian /
  * nested-loop joins (except the documented broadcast-NL cases) and
  * report exchange counts — the "is this the plan you'd want at
  * 100 TB" review loop. Run as a main for the report; PlanAuditSpec
  * asserts zero flags in `sbt test` so a plan regression fails CI,
  * not just an ad-hoc sweep. */
object PlanAudit {
  // queries where a broadcast nested-loop/cross join is the intended
  // physical shape (small broadcast side by construction)
  private val intendedCross = Set(
    "q26_cosine_topk",  // |Q|=10 broadcast × corpus — exact baseline
    "q27_ivf_topk",     // 10 centroids broadcast (assignment stage)
    "q43_brand_fuzzy",  // 5-brand whitelist broadcast
    "q47_embedding_neardup", // plane literals only; flag if a join appears
    "q69_range_join",   // 3-interval tier dim broadcast (range condition)
    "q76_tfidf_topterms", // 1-row doc-count scalar broadcast into every task
    "q78_int8_quant",   // |Q|=10 broadcast × corpus — q26's exact-baseline shape
    "q89_kmeans_step",  // k=8 centroid broadcast × corpus — Lloyd assignment
    "q91_quantile_sketch", // 1-row min/max bounds broadcast into the bin scan
    "q97_semdedup",     // centroid broadcast × corpus — assignment stage
    "q98_lm_quality",   // 1-row vocabulary-size scalar broadcast into the model
    "q99_dsir_select",  // 1-row gram-total scalar broadcast into the B-bucket model
    "q106_pagerank",    // 1-row node-count scalar broadcast into each power
                        // iteration's base term (visible since the iteration
                        // chain went lazy; bounded by construction)
    "q119_kmv_intersect", // two 1-row (≤64-element sketch) frames crossed +
                          // the 1-row exact-count frame — sketch ALGEBRA is
                          // O(k) by design, never corpus-sized
    "q120_ann_recall",  // inherits q26/q27's |Q|=10 broadcast × corpus
                        // shapes (exact ground truth + probe assignment)
    "q121_pmi_collocations", // two 1-row corpus-total scalars broadcast
                             // into the vocabulary-sized PMI table
    "q122_decile_bins", // 1-row row-count scalar broadcast into the
                        // per-value bin rule
    "q123_benford",     // 1-row total-count scalar broadcast into the
                        // 9-row digit table (q125's shape)
    "q124_gap_fill",    // 1-row (min,max)-hour bounds broadcast into the
                        // |types| × |hours| generated spine
    "q125_chisq",       // 1-row grand-total scalar broadcast into the
                        // cell-count contingency table
    "q126_bm25_topk",   // 1-row corpus-stats scalar (N, Σdl) broadcast
                        // into the query-term-filtered tf table
    "q127_nb_classify", // 1-row vocab-size / train-doc-count scalars +
                        // |classes| grid crossed into the vocab-sized
                        // model build — all bounded by construction
    "q135_decision_stump", // |classes| grid cross + 1-row total-count
                           // scalar broadcast into the per-threshold
                           // Gini table — both bounded
    "q144_time_to_convert", // 1-row total + 1-row quantile frames
                            // crossed into the 1-row report
    "q145_session_stats",   // 1-row totals × 1-row median — bounded
    "q146_psi_drift",       // 1-row period-count scalar + 1-row
                            // 9-element boundary array broadcast into
                            // the bucket assignment — bounded
    "q149_burst_hours",     // 1-row (min,max)-hour bounds broadcast
                            // into the generated spine (q124's shape)
    "q152_vocab_coverage",  // 1-row corpus-total scalar broadcast into
                            // the ≤16-row ladder curve — bounded
    "q155_rfm_segments",    // 1-row customer-count scalar broadcast
                            // into each dimension's bucket rule (q122's
                            // shape, three times)
    "q156_centroid_classify", // |labels|-row (≤640-cell) centroid table
                              // broadcast-crossed into the map-only
                              // classify pass — bounded by the label
                              // space, never corpus-sized
    "q194_hard_negatives",  // |anchors|=20 broadcast × corpus — q26's
                            // exact-baseline shape with a label filter
    "q195_pr_curve",        // 1-row positive-total scalar broadcast
                            // into the domain-bounded cell table
    "q196_context_packing", // 10-centroid broadcast × corpus — q27's
                            // IVF assignment stage reused for packing
    "q166_ks_drift",          // ≤30-row corpus log2-CDF + 1-row total
                              // broadcast into the per-source grid —
                              // bounded by the bucket domain
    "q167_rrf_fusion",        // inherits q26's |Q|=10 broadcast ×
                              // corpus exact-cosine leg + a 1-row
                              // corpus-stats broadcast on the idf path
    "q84_compaction_plan",    // 1-row quantile-bounds array broadcast
                              // into PrefixSum's bucket assignment —
                              // bounded by the bucket count (the other
                              // PrefixSum callers carry their own
                              // bounded-cross entries already)
    "q161_polygon_join")      // 8-row polygon dim broadcast into the
                              // bbox-range prefilter (non-equi ⇒ BNL by
                              // construction; at many-polygon scale the
                              // same pipeline becomes the q28 grid-cell
                              // equi-join)

  final case class Audit(name: String, exchanges: Int, bnl: Boolean,
                         flag: String)

  def audit(spark: SparkSession, dir: String): Seq[Audit] =
    Registry.all.map { q =>
      try {
        val plan = q.run(spark, dir).queryExecution.executedPlan.toString
        val cartesian = plan.contains("CartesianProduct")
        val bnl = plan.contains("BroadcastNestedLoopJoin")
        val exchanges = "Exchange".r.findAllIn(plan).length
        val flag =
          if (cartesian) "CARTESIAN!"
          else if (bnl && !intendedCross(q.name)) "UNEXPECTED-BNL!"
          else ""
        Audit(q.name, exchanges, bnl, flag)
      } catch {
        case e: Throwable =>
          Audit(q.name, -1, bnl = false,
            s"PLANFAIL ${e.getMessage.take(80)}")
      }
    }

  def main(args: Array[String]): Unit = {
    val spark = Tables.session("audit")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val results = audit(spark, dir)
    results.foreach { a =>
      println(f"${a.name}%-26s exchanges=${a.exchanges}%-3d " +
        f"${if (a.bnl) "bnl" else ""}%-4s ${a.flag}")
    }
    println(s"flagged=${results.count(_.flag.nonEmpty)}")
    spark.stop()
  }
}
