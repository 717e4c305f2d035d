package graft.queries

import graft.functions.TextFns
import graft.operators.Dedup
import graft.util.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-curation audit surface: the checks a training-data pipeline
  * runs on its SPLITS and its INCREMENTAL state — leakage across
  * held-out splits, n-gram novelty of the eval sets, deterministic
  * weighted sampling, and the merge-equals-recompute law for
  * incremental aggregation.
  */
object CurationQueries {

  /** q71's deterministic md5 90/5/5 split — shared so the audits
    * interrogate the SAME membership the split query publishes. */
  private def splitCol: Column = {
    val h = Dedup.md5Int32(col("doc_id").cast(StringType))
    when(h % 100 < 90, "train").when(h % 100 < 95, "val").otherwise("test")
  }

  private val splitSql =
    """CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |       % 100 < 90 THEN 'train'
      |     WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |       % 100 < 95 THEN 'val'
      |     ELSE 'test' END""".stripMargin

  val all: Seq[Q] = Seq(

    // Split-leakage audit: where do duplicate groups land across
    // q71's train/val/test splits? The held-out set is only held out
    // if no copy of a train document sits in val/test
    // (deduplication-before-splitting is the rule this audit
    // enforces; cf. Lee et al. 2022 "Deduplicating Training Data
    // Makes Language Models Better", arXiv:2107.06499 §5 on
    // train/test overlap). The dup key is THE ENGINE'S OWN exact-
    // dedup key (q21's 3-token prefix) so the audit interrogates
    // precisely the groups the dedup pass would collapse. Every dup
    // group (≥ 2 copies) is keyed by its SORTED split set — a
    // multi-split row IS a leak; single-split rows are the safe
    // baseline that keeps the audit verifiable when no leak exists.
    // One wordcount on the dup key; that shuffle is the only
    // corpus-scale stage.
    Q("q139_split_leakage",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
          .select(col("doc_id"),
            array_join(slice(TextFns.tokens(col("text")), 1, 3), " ").as("th"),
            splitCol.as("split"))
        d.groupBy(col("th"))
          .agg(countDistinct(col("split")).as("ns"),
            count(lit(1)).cast(LongType).as("n_docs"),
            array_join(sort_array(collect_set(col("split"))), ",")
              .as("split_set"))
          .filter(col("n_docs") >= 2)
          .groupBy(col("split_set"))
          .agg(count(lit(1)).cast(LongType).as("n_groups"),
            sum(col("n_docs")).cast(LongType).as("n_docs"),
            max(col("ns") >= 2).as("leaky"))
          .orderBy(col("split_set"))
      },
      Some(s"""WITH d AS (SELECT doc_id,
             |    COALESCE(array_to_string(list_slice(
             |      list_filter(string_split_regex(trim(text), '\\s+'),
             |        x -> x <> ''), 1, 3), ' '), '') AS th,
             |    $splitSql AS split
             |  FROM documents),
             |g AS (SELECT th, COUNT(DISTINCT split) AS ns,
             |    CAST(COUNT(*) AS BIGINT) AS n_docs,
             |    array_to_string(list_sort(list(DISTINCT split)), ',')
             |      AS split_set
             |  FROM d GROUP BY th)
             |SELECT split_set, CAST(COUNT(*) AS BIGINT) AS n_groups,
             |  CAST(SUM(n_docs) AS BIGINT) AS n_docs,
             |  MAX(ns >= 2) AS leaky
             |FROM g WHERE n_docs >= 2
             |GROUP BY split_set ORDER BY split_set""".stripMargin)),

    // Eval-set n-gram novelty: what fraction of val/test 8-gram
    // occurrences never appear in train? The memorization-risk
    // complement of the q81 contamination probe (high overlap ⇒ the
    // eval split measures recall of train, not generalization —
    // Carlini et al. 2023 quantify memorization by exactly this
    // n-gram overlap). Train's DISTINCT gram set is wordcount-shaped;
    // the eval gram stream left-anti-joins it on the gram key (one
    // bucketed shuffle, AQE-broadcastable when train's distinct set
    // is small); novelty is exact basis points.
    // ONE pass over the corpus-sized gram stream: a single wordcount
    // on the gram key carrying per-split occurrence counts; novelty
    // per eval split falls out of the same vocabulary-sized aggregate
    // (a gram is novel for a split iff its train count is zero) — no
    // second explode, no anti-join shuffle. The oracle keeps the
    // readable DISTINCT-set/anti-join formulation, so the two
    // formulations check each other.
    Q("q140_ngram_novelty",
      (s, dir) => {
        val gc = Tables.wide(s, dir, "documents")
          .select(splitCol.as("split"),
            explode(TextFns.shingles(col("text"), 8)).as("g"))
          .groupBy(col("g"))
          .agg(
            sum(when(col("split") === "train", 1L).otherwise(0L)).as("c_tr"),
            sum(when(col("split") === "val", 1L).otherwise(0L)).as("c_va"),
            sum(when(col("split") === "test", 1L).otherwise(0L)).as("c_te"))
        gc.select(explode(array(
            struct(lit("test").as("split"), col("c_te").as("c"), col("c_tr")),
            struct(lit("val").as("split"), col("c_va").as("c"), col("c_tr"))))
            .as("p"))
          .select(col("p.split").as("split"), col("p.c").as("c"),
            col("p.c_tr").as("c_tr"))
          .groupBy(col("split"))
          .agg(sum(col("c")).cast(LongType).as("n_grams"),
            sum(when(col("c_tr") === 0L, col("c")).otherwise(0L))
              .cast(LongType).as("n_novel"))
          .withColumn("novelty_bp", expr("(n_novel * 10000) div n_grams"))
          .orderBy(col("split"))
      },
      Some(s"""WITH d AS (SELECT doc_id, $splitSql AS split,
             |    unnest(CASE WHEN len(toks) < 8 THEN CAST([] AS VARCHAR[])
             |      ELSE list_transform(range(1, len(toks) - 6),
             |        i -> array_to_string(list_slice(toks, i, i + 7), ' '))
             |      END) AS g
             |  FROM (SELECT doc_id,
             |      list_filter(string_split_regex(trim(text), '\\s+'),
             |        x -> x <> '') AS toks
             |    FROM documents)),
             |train AS (SELECT DISTINCT g FROM d WHERE split = 'train'),
             |ev AS (SELECT split, g FROM d WHERE split <> 'train'),
             |nv AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS n_novel
             |  FROM ev ANTI JOIN train USING (g) GROUP BY split),
             |tot AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS n_grams
             |  FROM ev GROUP BY split)
             |SELECT split, n_grams, COALESCE(n_novel, 0) AS n_novel,
             |  (COALESCE(n_novel, 0) * 10000) // n_grams AS novelty_bp
             |FROM tot LEFT JOIN nv USING (split)
             |ORDER BY split""".stripMargin)),

    // Deterministic weighted sampling per group: k docs per source
    // with inclusion preference proportional to n_chars — the
    // RNG-free analog of weighted reservoir sampling (Efraimidis &
    // Spirtakis 2006 order by u^(1/w); here the order key is the
    // exact integer (md5(id)·2²⁰) div w, so heavier docs draw
    // smaller keys more often and ANY engine recomputes identical
    // membership from ids alone). Runs through the bounded-buffer
    // top-k physical operator (per-task k-row state — a window would
    // sort whole source partitions; the q72 scale argument).
    Q("q141_weighted_sample",
      (s, dir) => {
        val key = expr(
          "(CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) " +
            "AS BIGINT) * 1048576) div greatest(n_chars, 1L)")
        graft.plans.TopKPhysical.topK(
          Tables(s, dir, "documents").withColumn("_k", key),
          groupBy = Seq("source"),
          orderBy = Seq(("_k", true), ("doc_id", true)), k = 10,
          rankName = "rn")
          .select(col("source"), col("rn"), col("doc_id"),
            col("_k").as("wkey"))
          .orderBy(col("source"), col("rn"))
      },
      Some("""SELECT source, CAST(rn AS INT) AS rn, doc_id, wkey FROM (
             |  SELECT source, doc_id, wkey,
             |    ROW_NUMBER() OVER (PARTITION BY source
             |      ORDER BY wkey, doc_id) AS rn
             |  FROM (SELECT source, doc_id,
             |      (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
             |        * 1048576) // GREATEST(n_chars, 1) AS wkey
             |    FROM documents))
             |WHERE rn <= 10 ORDER BY source, rn""".stripMargin)),

    // Incremental aggregation: merge yesterday's per-user state with
    // today's delta and land EXACTLY what a full recompute lands —
    // the merge-equals-recompute law every incremental pipeline
    // depends on (partial-aggregate semantics made explicit). Spark
    // computes state(before cutoff) ⟕⟖ delta(after cutoff) with
    // coalesce-add merge; THE ORACLE IS THE FULL RECOMPUTE, so any
    // divergence between the incremental path and the one-shot
    // aggregate fails verification. Sums are micro-unit integers;
    // both sides shuffle once per branch on user_id.
    Q("q142_incremental_agg",
      (s, dir) => {
        val cut = lit("2024-01-16 00:00:00").cast(TimestampType)
        val ev = Tables(s, dir, "events")
          .select(col("user_id"), col("ts"),
            expr("CAST(round(value * 1000000) AS BIGINT)").as("v_us"))
        def agg(df: org.apache.spark.sql.DataFrame) = df
          .groupBy(col("user_id"))
          .agg(count(lit(1)).cast(LongType).as("n"),
            sum(col("v_us")).cast(LongType).as("sum_us"),
            max(col("ts")).as("last_ts"))
        val state = agg(ev.filter(col("ts") < cut))
        val delta = agg(ev.filter(col("ts") >= cut))
        state.select(col("user_id"), col("n").as("n0"),
            col("sum_us").as("s0"), col("last_ts").as("t0"))
          .join(delta.select(col("user_id"), col("n").as("n1"),
            col("sum_us").as("s1"), col("last_ts").as("t1")),
            Seq("user_id"), "full_outer")
          .select(col("user_id"),
            (coalesce(col("n0"), lit(0L)) + coalesce(col("n1"), lit(0L)))
              .as("n_events"),
            (coalesce(col("s0"), lit(0L)) + coalesce(col("s1"), lit(0L)))
              .as("sum_us"),
            unix_micros(greatest(
              coalesce(col("t0"), col("t1")),
              coalesce(col("t1"), col("t0")))).as("last_us"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
             |  CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
             |    AS sum_us,
             |  epoch_us(MAX(ts)) AS last_us
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Cross-document exact-substring duplication pairs — the PAIRWISE
    // half of exact-substring dedup (Lee et al., arXiv:2107.06499;
    // q107 scrubs the intra-doc half, q114 the corpus-frequency
    // boilerplate): which document PAIRS share exact 8-token windows,
    // and how much of the smaller document is covered? This is the
    // decision input for span-level dedup — symmetric Jaccard (q133)
    // misses an excerpt inside a long doc, and winnowing (q75)
    // samples; this is exact and exhaustive over qualifying windows.
    // Shape at scale: per-doc DISTINCT windows (wordcount-shaped),
    // window df once, and pairing ONLY inside windows with
    // 2 ≤ df ≤ 50 — pair work is Σ df² bounded by 50·Σ df, the
    // bucketed-not-all-pairs discipline (SemanticDedup's cap
    // convention); df > 50 windows ARE boilerplate and belong to
    // q114's scrub, and the cap is modeled IDENTICALLY in the oracle
    // so parity is exact by construction, not luck. share_bp is an
    // exact integer over the smaller doc's window count (the
    // containment direction, q143's asymmetric-similarity argument).
    Q("q151_substring_pairs",
      (s, dir) => {
        // per-doc dedup inside the array (the q133 shape): (doc_id, g)
        // is then unique by construction — no corpus-wide DISTINCT
        // shuffle, and the per-doc window total is just size(arr)
        val docArr = Tables.wide(s, dir, "documents")
          .select(col("doc_id"),
            array_distinct(TextFns.shingles(col("text"), 8)).as("arr"))
          .localCheckpoint(eager = false)
        // ONE g-keyed exchange (r15, the winnowingPairs shape): the
        // window df count replaces the groupBy+semi-join round trip,
        // and both self-join sides reuse the pinned exchange — the
        // explicit repartition also stops AQE sizing the
        // pair-exploding join from its input stats (observed: the
        // pair stage coalesced to 4 tasks).
        val par = s.sparkContext.defaultParallelism
        val w = docArr.select(col("doc_id"), explode(col("arr")).as("g"))
          .repartition(par, col("g"))
        val nw = docArr.select(col("doc_id"),
          size(col("arr")).cast(LongType).as("nw"))
        val ww = w
          .withColumn("df", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("g"))))
          .filter(col("df").between(2L, 50L))
          .drop("df")
        // df guard on ONE side only (the winnowingPairs argument): a
        // pair forms at g iff g survives on the a side, and the raw b
        // side then contributes exactly the kept rows — b probes the
        // shared exchange without the sort+window
        val p = ww.as("a").join(w.as("b"), Seq("g"))
          .filter(col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .agg(count(lit(1)).cast(LongType).as("n_shared"))
          .filter(col("n_shared") >= 3L)
        p.join(nw.select(col("doc_id").as("doc_a"), col("nw").as("nw_a")),
            "doc_a")
          .join(nw.select(col("doc_id").as("doc_b"), col("nw").as("nw_b")),
            "doc_b")
          .withColumn("share_bp",
            expr("(n_shared * 10000) div least(nw_a, nw_b)"))
          .select(col("doc_a"), col("doc_b"), col("n_shared"),
            col("nw_a"), col("nw_b"), col("share_bp"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some("""WITH d AS (SELECT doc_id,
             |    list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> x <> '') AS toks
             |  FROM documents),
             |w AS (SELECT DISTINCT doc_id,
             |    unnest(CASE WHEN len(toks) < 8 THEN CAST([] AS VARCHAR[])
             |      ELSE list_transform(range(1, len(toks) - 6),
             |        i -> array_to_string(list_slice(toks, i, i + 7), ' '))
             |      END) AS g
             |  FROM d),
             |nw AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nw
             |  FROM w GROUP BY doc_id),
             |df AS (SELECT g FROM w GROUP BY g
             |  HAVING COUNT(*) BETWEEN 2 AND 50),
             |ww AS (SELECT doc_id, g FROM w SEMI JOIN df USING (g)),
             |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |    CAST(COUNT(*) AS BIGINT) AS n_shared
             |  FROM ww a JOIN ww b ON a.g = b.g AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2 HAVING COUNT(*) >= 3)
             |SELECT doc_a, doc_b, n_shared, na.nw AS nw_a, nb.nw AS nw_b,
             |  (n_shared * 10000) // LEAST(na.nw, nb.nw) AS share_bp
             |FROM p JOIN nw na ON doc_a = na.doc_id
             |  JOIN nw nb ON doc_b = nb.doc_id
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // Tokenizer vocabulary-budget curve: what fraction of corpus token
    // OCCURRENCES does a top-V vocabulary cover, for a ladder of V?
    // The coverage/OOV-rate analysis run before fixing a tokenizer's
    // vocab size (Sennrich et al. arXiv:1508.07909 motivate BPE by
    // exactly this open-vocabulary coverage gap; q100–q102 train the
    // merges, this sizes the budget). Shape at scale: one map-side-
    // combined wordcount; the global top-V ladder head runs through
    // the bounded-buffer top-k physical operator (≤ max-V rows per
    // task — never a global ORDER BY of the vocabulary); the
    // vocabulary-HEAD-sized artifact (16 rows here) cross-joins the
    // broadcast threshold ladder and total, so the curve is exact
    // integer basis points at any corpus size. The ladder tops out at
    // 16 because the synthetic corpus has a 31-token vocabulary — on
    // a real corpus the same ladder reads {1k..256k} with identical
    // plan shape (K = max rung, still bounded state).
    Q("q152_vocab_coverage",
      (s, dir) => {
        val c = Tables.wide(s, dir, "documents")
          .select(explode(TextFns.tokens(col("text"))).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).cast(LongType).as("c"))
        val tot = c.agg(sum(col("c")).cast(LongType).as("n"))
        val top = graft.plans.TopKPhysical.topK(
          c.withColumn("all", lit(1)), Seq("all"),
          Seq(("c", false), ("w", true)), 16, rankName = "rn")
        top
          .select(col("c"), col("rn"),
            explode(expr("array(1, 2, 4, 8, 16)")).as("vocab_size"))
          .filter(col("rn") <= col("vocab_size"))
          .groupBy(col("vocab_size"))
          .agg(sum(col("c")).cast(LongType).as("n_covered"))
          .crossJoin(broadcast(tot))
          .select(col("vocab_size"), col("n_covered"),
            col("n").as("n_total"),
            expr("(n_covered * 10000) div n").as("coverage_bp"))
          .orderBy(col("vocab_size"))
      },
      Some("""WITH t AS (SELECT unnest(list_filter(
             |      string_split_regex(trim(text), '\s+'), x -> x <> '')) AS w
             |  FROM documents),
             |c AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY w),
             |r AS (SELECT w, c, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rn
             |  FROM c),
             |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM c)
             |SELECT vs AS vocab_size, CAST(SUM(c) AS BIGINT) AS n_covered,
             |  MAX(n) AS n_total,
             |  (CAST(SUM(c) AS BIGINT) * 10000) // MAX(n) AS coverage_bp
             |FROM r, tot, unnest([1, 2, 4, 8, 16]) AS v(vs)
             |WHERE rn <= vs GROUP BY vs ORDER BY vs""".stripMargin)),

    // Keep-first exact-substring scrub — the REMOVAL stage completing
    // the q151 pairs (Lee et al. arXiv:2107.06499 remove all-but-one
    // occurrence of each long duplicated span; q114's boilerplate
    // scrub removes from EVERY doc, which destroys the canonical
    // copy): for each qualifying shared 8-token window
    // (2 ≤ doc-df ≤ 50, the q151 cap with the same boilerplate
    // argument), the MIN-doc_id holder keeps its text and every other
    // doc has the covered token positions removed. Doc-granularity
    // keeper (not occurrence-granularity) makes the scrub
    // deterministic under any partitioning — keeper choice is a pure
    // min over the window group, no ordering dependence. Shape at
    // scale: positional windows are q114's stream; the qualifying-
    // window table carries (g → keeper) from the SAME aggregate that
    // computes df (one shuffle); covered positions collect per doc
    // (span-count-sized state); the rewrite is per-row HOF work with
    // no further shuffle. Output is AFFECTED docs only.
    Q("q153_keepfirst_scrub",
      (s, dir) => {
        // LocalExact hybrid (the q98/q121 convention): window
        // hashing, keeper election and span scrubbing in one
        // sequential pass; only docs with ≥1 removed span surface
        // (the inner-join semantics of the distributed plan)
        val localOut = graft.operators.LocalExact(
          Tables(s, dir, "documents").select(col("doc_id"), col("text")),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("doc_id", LongType),
            org.apache.spark.sql.types.StructField("n_tokens", LongType),
            org.apache.spark.sql.types.StructField("n_removed", LongType),
            org.apache.spark.sql.types.StructField("scrub_bp", LongType))),
          100000L) { it =>
          import graft.functions.Md5Kernel
          val docs = it.map(r => (r.getLong(0), Md5Kernel.tokenize(r.getString(1))))
            .toArray
          // per 8-token window: distinct-doc df and min-doc keeper
          final case class G(var df: Long, var last: Long, var keeper: Long)
          val gs = new java.util.HashMap[String, G]()
          docs.foreach { case (id, toks) =>
            var i = 0
            while (i + 7 < toks.length) {
              val g = toks.slice(i, i + 8).mkString(" ")
              val e = gs.get(g)
              if (e == null) gs.put(g, G(1L, id, id))
              else {
                if (e.last != id) { e.df += 1L; e.last = id }
                if (id < e.keeper) e.keeper = id
              }
              i += 1
            }
          }
          docs.iterator.flatMap { case (id, toks) =>
            val spans = scala.collection.mutable.ArrayBuffer.empty[Int]
            var i = 0
            while (i + 7 < toks.length) {
              val e = gs.get(toks.slice(i, i + 8).mkString(" "))
              if (e.df >= 2L && e.df <= 50L && e.keeper != id) spans += (i + 1)
              i += 1
            }
            if (spans.isEmpty) None
            else {
              val removed = new Array[Boolean](toks.length + 1)
              spans.foreach { x =>
                var j = x
                while (j <= math.min(x + 7, toks.length)) { removed(j) = true; j += 1 }
              }
              val nRem = (1 to toks.length).count(removed(_)).toLong
              Some(org.apache.spark.sql.Row(id, toks.length.toLong, nRem,
                (nRem * 10000L) / toks.length))
            }
          }
        }
        localOut.map(_.orderBy(col("doc_id"))).getOrElse {
        val toks = Tables(s, dir, "documents")
          .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
        val win = toks.filter(size(col("toks")) >= 8)
          .select(col("doc_id"), explode(expr(
            """transform(sequence(1, size(toks) - 7),
              |  i -> named_struct('i', i, 'g', array_join(slice(toks, i, 8), ' ')))"""
              .stripMargin)).as("w"))
          .select(col("doc_id"), col("w.i").as("i"), col("w.g").as("g"))
        val q = win.groupBy(col("g"))
          .agg(countDistinct(col("doc_id")).as("df"),
            min(col("doc_id")).as("keeper"))
          .filter(col("df").between(2L, 50L))
          .select(col("g"), col("keeper"))
        val spans = win.join(q, "g")
          .filter(col("doc_id") =!= col("keeper"))
          .groupBy(col("doc_id")).agg(collect_set(col("i")).as("spans"))
        toks.join(spans, "doc_id")
          .select(col("doc_id"), col("toks"), expr(
            """filter(sequence(1, size(toks)),
              |  j -> NOT exists(spans, x -> j >= x AND j <= x + 7))"""
              .stripMargin).as("kept"))
          .select(col("doc_id"),
            size(col("toks")).cast(LongType).as("n_tokens"),
            (size(col("toks")) - size(col("kept"))).cast(LongType)
              .as("n_removed"),
            expr("((size(toks) - size(kept)) * 10000L) div size(toks)")
              .as("scrub_bp"))
          .orderBy(col("doc_id"))
        }
      },
      Some("""WITH d AS (SELECT doc_id,
             |    list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> x <> '') AS toks
             |  FROM documents),
             |w AS (SELECT doc_id, i,
             |    array_to_string(list_slice(toks, i, i + 7), ' ') AS g
             |  FROM d, unnest(range(1, len(toks) - 6)) AS u(i)
             |  WHERE len(toks) >= 8),
             |q AS (SELECT g, MIN(doc_id) AS keeper FROM w GROUP BY g
             |  HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 50),
             |sp AS (SELECT doc_id, list(DISTINCT i) AS spans
             |  FROM w JOIN q USING (g) WHERE doc_id <> keeper
             |  GROUP BY doc_id),
             |k2 AS (SELECT d.doc_id, toks,
             |    list_filter(range(1, len(toks) + 1),
             |      j -> len(list_filter(spans, x -> j >= x AND j <= x + 7)) = 0)
             |      AS kept
             |  FROM d JOIN sp ON d.doc_id = sp.doc_id)
             |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
             |  CAST(len(toks) - len(kept) AS BIGINT) AS n_removed,
             |  (CAST(len(toks) - len(kept) AS BIGINT) * 10000) // len(toks)
             |    AS scrub_bp
             |FROM k2 ORDER BY doc_id""".stripMargin)),

    // Directional source-contamination matrix: for each ordered source
    // pair (a, b), what fraction of a's distinct 8-token windows also
    // appear in b? The source-granularity counterpart of q151's doc
    // pairs and q81's train/eval probe — the diagnostic a mixture
    // pipeline reads to find which feeds copy from which (direction
    // matters: a small source fully contained in a large one is
    // upstream syndication; the reverse is sampling). Shape at scale:
    // per-source DISTINCT windows are wordcount-shaped; the pair join
    // happens per window over its source set, bounded by |sources|²
    // per window BY CONSTRUCTION (source df ≤ |sources| — no cap
    // needed, unlike q151's doc-df); per-source window totals are a
    // |sources|-row broadcast. Exact basis points, ordered pairs.
    Q("q154_source_contamination",
      (s, dir) => {
        val w = Tables.wide(s, dir, "documents")
          .select(col("source"),
            explode(TextFns.shingles(col("text"), 8)).as("g"))
          .distinct()
          .localCheckpoint(eager = false) // feeds totals and both pair sides
        val nw = w.groupBy(col("source"))
          .agg(count(lit(1)).cast(LongType).as("nw"))
        val p = w.as("a").join(w.as("b"), Seq("g"))
          .filter(col("a.source") =!= col("b.source"))
          .groupBy(col("a.source").as("source_a"),
            col("b.source").as("source_b"))
          .agg(count(lit(1)).cast(LongType).as("n_shared"))
        p.join(broadcast(nw.select(col("source").as("source_a"),
            col("nw").as("nw_a"))), "source_a")
          .withColumn("cont_bp", expr("(n_shared * 10000) div nw_a"))
          .select(col("source_a"), col("source_b"), col("n_shared"),
            col("nw_a"), col("cont_bp"))
          .orderBy(col("source_a"), col("source_b"))
      },
      Some("""WITH d AS (SELECT doc_id, source,
             |    list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> x <> '') AS toks
             |  FROM documents),
             |w AS (SELECT DISTINCT source,
             |    unnest(CASE WHEN len(toks) < 8 THEN CAST([] AS VARCHAR[])
             |      ELSE list_transform(range(1, len(toks) - 6),
             |        i -> array_to_string(list_slice(toks, i, i + 7), ' '))
             |      END) AS g
             |  FROM d),
             |nw AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nw
             |  FROM w GROUP BY source),
             |p AS (SELECT a.source AS source_a, b.source AS source_b,
             |    CAST(COUNT(*) AS BIGINT) AS n_shared
             |  FROM w a JOIN w b ON a.g = b.g AND a.source <> b.source
             |  GROUP BY 1, 2)
             |SELECT source_a, source_b, n_shared, nw.nw AS nw_a,
             |  (n_shared * 10000) // nw.nw AS cont_bp
             |FROM p JOIN nw ON source_a = nw.source
             |ORDER BY source_a, source_b""".stripMargin)),

    // Two-sample Kolmogorov–Smirnov drift audit per source (Smirnov
    // 1939; Massey 1951 — public): the SUP-NORM counterpart of q146's
    // PSI divergence — for each source, the maximum gap between its
    // document-length CDF and the whole corpus's, in exact basis
    // points. Lengths bucket to floor-log2 (≤ ~30 buckets), so the
    // per-source CDFs live on a tiny shared support: one map-side-
    // combined (source, bucket) count is the only corpus pass, the
    // corpus CDF broadcasts, and the per-source running sums window
    // over ≤ 30 rows per source. Exact integers throughout:
    // F_src and F_all compare as cross-multiplied counts
    // (|c_src·n_all − c_all·n_src| · 10⁴ div (n_src·n_all) after the
    // max — one floor division per source). The bucket union is the
    // corpus support by construction (every source bucket is a corpus
    // bucket), and gaps are evaluated at every corpus bucket via a
    // left join with running-sum carry, so the sup is over the full
    // merged support.
    Q("q166_ks_drift",
      (s, dir) => {
        val b = Tables(s, dir, "documents")
          .select(col("source"),
            (length(bin(greatest(col("n_chars"), lit(1L)))) - 1)
              .cast(LongType).as("bk"))
        val sc = b.groupBy(col("source"), col("bk"))
          .agg(count(lit(1)).cast(LongType).as("c"))
          .localCheckpoint(eager = false) // feeds the corpus rollup AND the CDF join
        val ac = sc.groupBy(col("bk"))
          .agg(sum(col("c")).cast(LongType).as("ca"))
        val nAll = ac.agg(sum(col("ca")).cast(LongType).as("n_all"))
        val wAll = Window.orderBy(col("bk"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cumAll = ac.withColumn("fa", sum(col("ca")).over(wAll))
        val nSrc = sc.groupBy(col("source"))
          .agg(sum(col("c")).cast(LongType).as("n_src"))
        // evaluate at EVERY corpus bucket: left-join source counts and
        // carry the source's running sum across missing buckets
        val wSrc = Window.partitionBy(col("source")).orderBy(col("bk"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val grid = nSrc.crossJoin(broadcast(cumAll))
          .join(sc, Seq("source", "bk"), "left")
          .withColumn("fs", sum(coalesce(col("c"), lit(0L))).over(wSrc))
        grid.crossJoin(broadcast(nAll))
          .withColumn("gap", abs(col("fs") * col("n_all") - col("fa") * col("n_src")))
          .groupBy(col("source"), col("n_src"))
          .agg(max(col("gap")).as("max_gap"))
          .crossJoin(broadcast(nAll))
          .withColumn("ks_bp", expr("(max_gap * 10000) div (n_src * n_all)"))
          .select(col("source"), col("n_src"), col("ks_bp"))
          .orderBy(col("source"))
      },
      Some("""WITH b AS (SELECT source,
             |    CAST(length(bin(GREATEST(n_chars, 1))) - 1 AS BIGINT) AS bk
             |  FROM documents),
             |sc AS (SELECT source, bk, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM b GROUP BY 1, 2),
             |ac AS (SELECT bk, CAST(SUM(c) AS BIGINT) AS ca FROM sc GROUP BY 1),
             |na AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_all FROM ac),
             |ca AS (SELECT bk, ca, SUM(ca) OVER (ORDER BY bk
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fa
             |  FROM ac),
             |ns AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_src
             |  FROM sc GROUP BY 1),
             |grid AS (SELECT ns.source, ns.n_src, ca.bk, ca.fa,
             |    SUM(COALESCE(sc.c, 0)) OVER (PARTITION BY ns.source
             |      ORDER BY ca.bk
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fs
             |  FROM ns CROSS JOIN ca
             |  LEFT JOIN sc ON sc.source = ns.source AND sc.bk = ca.bk)
             |SELECT g.source, g.n_src,
             |  CAST((MAX(abs(g.fs * na.n_all - g.fa * g.n_src)) * 10000)
             |    // (g.n_src * na.n_all) AS BIGINT) AS ks_bp
             |FROM grid g, na
             |GROUP BY g.source, g.n_src, na.n_all ORDER BY g.source""".stripMargin)),

    // Zipf-fit slope per source (Zipf 1949; Piantadosi 2014's review —
    // public): the log-log OLS of token frequency against rank, the
    // datacard diagnostic that separates natural text (slope ≈ −1)
    // from template/boilerplate-heavy sources (flatter or steeper
    // tails) — a corpus-health number next to q134's entropy. Exact
    // integers end-to-end: both axes quantize to floor-log2 via the
    // length(bin(x))−1 identity (the q98 discipline), the closed-form
    // OLS runs over DECIMAL(38,0) sums (the q116 convention;
    // Spark div ≡ DuckDB // — both truncate toward zero, pinned for
    // the negative slope here), and the slope/intercept publish in
    // micro-units. Scale shape: one map-side-combined wordcount is
    // the only corpus-sized pass; the rank window and the OLS sums
    // run on the vocabulary-sized table, partitioned by source.
    Q("q158_zipf_slope",
      (s, dir) => {
        val dec = DecimalType(38, 0)
        val c = Tables(s, dir, "documents")
          .select(col("source"), explode(TextFns.tokens(col("text"))).as("w"))
          .groupBy(col("source"), col("w"))
          .agg(count(lit(1)).cast(LongType).as("c"))
        val xy = c.withColumn("rnk", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("source")).orderBy(col("c").desc, col("w"))))
          .select(col("source"),
            (length(bin(col("rnk"))) - 1).cast(LongType).as("x"),
            (length(bin(col("c"))) - 1).cast(LongType).as("y"))
        xy.groupBy(col("source"))
          .agg(count(lit(1)).cast(dec).as("n"),
            sum(col("x").cast(dec)).as("sx"),
            sum(col("y").cast(dec)).as("sy"),
            sum((col("x") * col("y")).cast(dec)).as("sxy"),
            sum((col("x") * col("x")).cast(dec)).as("sxx"))
          // n ≥ 2 ⇒ ranks 1 and 2 exist ⇒ x takes two values ⇒ the
          // OLS denominator is strictly positive — a single-word
          // source (possible on adversarial corpora) would otherwise
          // divide by zero under the driver's ANSI session
          .filter(col("n") >= lit(2))
          .withColumn("slope_micro", expr(
            "CAST((1000000 * (n * sxy - sx * sy)) div (n * sxx - sx * sx) AS BIGINT)"))
          .withColumn("intercept_micro", expr(
            "CAST((1000000 * sy - slope_micro * sx) div n AS BIGINT)"))
          .select(col("source"), col("n").cast(LongType).as("n_vocab"),
            col("slope_micro"), col("intercept_micro"))
          .orderBy(col("source"))
      },
      Some("""WITH t AS (SELECT source,
             |    unnest(list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> x <> '')) AS w
             |  FROM documents),
             |c AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM t GROUP BY 1, 2),
             |r AS (SELECT source,
             |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY c DESC, w) AS rnk,
             |    c FROM c),
             |xy AS (SELECT source,
             |    CAST(length(bin(rnk)) - 1 AS BIGINT) AS x,
             |    CAST(length(bin(c)) - 1 AS BIGINT) AS y
             |  FROM r),
             |m AS (SELECT source, CAST(COUNT(*) AS HUGEINT) AS n,
             |    CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
             |    CAST(SUM(x * y) AS HUGEINT) AS sxy,
             |    CAST(SUM(x * x) AS HUGEINT) AS sxx
             |  FROM xy GROUP BY 1 HAVING COUNT(*) >= 2),
             |f AS (SELECT source, n,
             |    (1000000 * (n * sxy - sx * sy)) // (n * sxx - sx * sx) AS slope_micro
             |  FROM m)
             |SELECT f.source, CAST(f.n AS BIGINT) AS n_vocab,
             |  CAST(f.slope_micro AS BIGINT) AS slope_micro,
             |  CAST((1000000 * m.sy - f.slope_micro * m.sx) // m.n AS BIGINT)
             |    AS intercept_micro
             |FROM f JOIN m ON f.source = m.source
             |ORDER BY f.source""".stripMargin)),

    // In-engine training of a linear text filter: 3 batch-perceptron
    // rounds over hashed bag-of-words features, labels = q19's
    // language axis (en vs rest) — the fastText-shaped keep/drop gate
    // (Joulin et al. 2016) a curation pipeline trains ON the corpus
    // it filters. All corpus-scale stages are the operator's
    // (operators/Perceptron): one wordcount-shaped feature build,
    // then per round one broadcast-weights margin aggregate and one
    // co-partitioned misclassified join — weights stay a 65-row
    // bounded artifact. Integer-exact end-to-end, so the DuckDB
    // oracle replays the entire training run as an unrolled CTE
    // (the q171 convention) and verifies every weight bit-for-bit.
    Q("q180_perceptron",
      (s, dir) => {
        val d = Tables.wide(s, dir, "documents")
          .select(col("doc_id"),
            when(col("lang") === "en", 1L).otherwise(-1L).as("y"),
            col("text"))
        val tf = d.select(col("doc_id"), col("y"),
            explode(TextFns.tokens(col("text"))).as("tok"))
          .groupBy(col("doc_id"), col("y"),
            (Dedup.md5Int32(col("tok")) % 64).as("b"))
          .agg(count(lit(1)).cast(LongType).as("x"))
        // bias feature rides as bucket 64 with x = 1 on every doc (so
        // zero-token documents still carry a trainable row)
        val feats = tf.select(col("doc_id"), col("y"), col("b"), col("x"))
          .unionAll(d.select(col("doc_id"), col("y"),
            lit(64L).as("b"), lit(1L).as("x")))
        graft.operators.Perceptron.train(feats, nBuckets = 64, iters = 3)
          .orderBy(col("b"))
      },
      Some("""WITH d AS (SELECT doc_id,
             |    CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
             |    list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> x <> '') AS toks
             |  FROM documents),
             |tf AS (SELECT doc_id, ANY_VALUE(y) AS y,
             |    ('0x' || substr(md5(tok), 1, 8))::BIGINT % 64 AS b,
             |    CAST(COUNT(*) AS BIGINT) AS x
             |  FROM d, unnest(toks) AS u(tok) GROUP BY doc_id, b),
             |feats AS (SELECT doc_id, y, b, x FROM tf
             |  UNION ALL SELECT doc_id, y, 64, 1 FROM d),
             |w0r AS (SELECT unnest(range(0, 65)) AS b),
             |w0 AS (SELECT CAST(b AS BIGINT) AS b, CAST(0 AS BIGINT) AS w
             |  FROM w0r),
             |m1 AS (SELECT f.doc_id, ANY_VALUE(f.y) AS y, SUM(w0.w * f.x) AS m
             |  FROM feats f JOIN w0 USING (b) GROUP BY f.doc_id),
             |u1 AS (SELECT f.b, CAST(SUM(f.y * f.x) AS BIGINT) AS u
             |  FROM feats f JOIN m1 ON f.doc_id = m1.doc_id
             |  WHERE m1.y * m1.m <= 0 GROUP BY f.b),
             |w1 AS (SELECT w0.b, w0.w + COALESCE(u1.u, 0) AS w
             |  FROM w0 LEFT JOIN u1 USING (b)),
             |m2 AS (SELECT f.doc_id, ANY_VALUE(f.y) AS y, SUM(w1.w * f.x) AS m
             |  FROM feats f JOIN w1 USING (b) GROUP BY f.doc_id),
             |u2 AS (SELECT f.b, CAST(SUM(f.y * f.x) AS BIGINT) AS u
             |  FROM feats f JOIN m2 ON f.doc_id = m2.doc_id
             |  WHERE m2.y * m2.m <= 0 GROUP BY f.b),
             |w2 AS (SELECT w1.b, w1.w + COALESCE(u2.u, 0) AS w
             |  FROM w1 LEFT JOIN u2 USING (b)),
             |m3 AS (SELECT f.doc_id, ANY_VALUE(f.y) AS y, SUM(w2.w * f.x) AS m
             |  FROM feats f JOIN w2 USING (b) GROUP BY f.doc_id),
             |u3 AS (SELECT f.b, CAST(SUM(f.y * f.x) AS BIGINT) AS u
             |  FROM feats f JOIN m3 ON f.doc_id = m3.doc_id
             |  WHERE m3.y * m3.m <= 0 GROUP BY f.b),
             |w3 AS (SELECT w2.b, w2.w + COALESCE(u3.u, 0) AS w
             |  FROM w2 LEFT JOIN u3 USING (b))
             |SELECT b, CAST(w AS BIGINT) AS w FROM w3 ORDER BY b""".stripMargin)),

    // Epoch-shuffled shard layout — the LAST step before the trainer
    // reads anything: assign every document a per-epoch pseudo-random
    // position (seeded md5 — a different but reproducible permutation
    // each epoch) and a shard by hash mod N, then publish the
    // per-shard manifest (doc/token balance + the head of each
    // shard's read order). The WebDataset/Megatron data-order shape.
    // Deliberately NO global row_number: a global sort is a
    // single-partition bottleneck at 100 TB, while hash-mod sharding
    // is embarrassingly parallel and provably balanced (audited here
    // by the manifest itself); the only per-shard sort is the one the
    // shard WRITER needs anyway (each (epoch, shard) partition sorts
    // its own slice — Spark runs all 32 concurrently).
    Q("q181_shard_layout",
      (s, dir) => {
        val base = Tables.wide(s, dir, "documents")
          .select(col("doc_id"),
            TextFns.tokenCount(col("text")).cast(LongType).as("n_tok"))
        val eps = base
          .select(col("doc_id"), col("n_tok"),
            explode(array(lit(1L), lit(2L))).as("epoch"))
          .withColumn("h", Dedup.md5Int32(concat(lit("ep"),
            col("epoch").cast(StringType), lit(":"),
            col("doc_id").cast(StringType))))
          .withColumn("shard", col("h") % 16)
        val w = Window.partitionBy(col("epoch"), col("shard"))
          .orderBy(col("h"), col("doc_id"))
        eps.withColumn("rn", row_number().over(w))
          .groupBy(col("epoch"), col("shard"))
          .agg(count(lit(1)).cast(LongType).as("n_docs"),
            sum(col("n_tok")).cast(LongType).as("n_tokens"),
            max(when(col("rn") === 1, col("doc_id"))).as("first_doc"),
            max(when(col("rn") === 2, col("doc_id"))).as("second_doc"))
          .orderBy(col("epoch"), col("shard"))
      },
      Some("""WITH d AS (SELECT doc_id,
             |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> x <> '')) AS BIGINT) AS n_tok
             |  FROM documents),
             |ep AS (SELECT unnest([1, 2]) AS epoch),
             |e AS (SELECT doc_id, n_tok, CAST(epoch AS BIGINT) AS epoch
             |  FROM d, ep),
             |h AS (SELECT epoch, doc_id, n_tok,
             |    ('0x' || substr(md5('ep' || CAST(epoch AS VARCHAR) || ':'
             |      || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
             |  FROM e),
             |r AS (SELECT epoch, doc_id, n_tok, h, h % 16 AS shard,
             |    ROW_NUMBER() OVER (PARTITION BY epoch, h % 16
             |      ORDER BY h, doc_id) AS rn
             |  FROM h)
             |SELECT epoch, shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
             |  MAX(CASE WHEN rn = 1 THEN doc_id END) AS first_doc,
             |  MAX(CASE WHEN rn = 2 THEN doc_id END) AS second_doc
             |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // END-TO-END curation pipeline composition — the proof that the
    // engine's curation stages CHAIN as one declarative plan the way
    // a user runs them: length-band quality filter → exact dedup
    // (keep-first by full-text hash) → q71's md5 train/val/test
    // split → q181's seeded shard assignment → per-(split, shard)
    // manifest. One corpus scan feeds everything; the dedup groupBy
    // is the only corpus-scale shuffle (the manifest aggregate runs
    // on the surviving keys). Catalyst fuses the filter into the
    // scan and pipelines split/shard as map stages — composing the
    // stages costs ONE plan, not four jobs with materialized
    // intermediates. The oracle replays the identical chain in SQL.
    Q("q184_curation_e2e",
      (s, dir) => {
        val d = Tables.wide(s, dir, "documents")
          .select(col("doc_id"), col("text"),
            TextFns.tokenCount(col("text")).cast(LongType).as("n_tok"))
          .filter(col("n_tok") >= 5 && col("n_tok") <= 5000)
        val kept = d
          .withColumn("tkey", Dedup.md5Long(col("text")))
          .groupBy(col("tkey"))
          .agg(min(struct(col("doc_id"), col("n_tok"))).as("m"))
          .select(col("m.doc_id").as("doc_id"), col("m.n_tok").as("n_tok"))
        kept
          .withColumn("split", splitCol)
          .withColumn("shard", Dedup.md5Int32(concat(lit("ep1:"),
            col("doc_id").cast(StringType))) % 8)
          .groupBy(col("split"), col("shard"))
          .agg(count(lit(1)).cast(LongType).as("n_docs"),
            sum(col("n_tok")).cast(LongType).as("n_tokens"),
            min(col("doc_id")).as("first_doc"))
          .orderBy(col("split"), col("shard"))
      },
      Some(s"""WITH d AS (SELECT doc_id, text,
             |    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
             |      x -> x <> '')) AS BIGINT) AS n_tok
             |  FROM documents),
             |f AS (SELECT * FROM d WHERE n_tok BETWEEN 5 AND 5000),
             |k AS (SELECT
             |    CAST(MIN({'doc_id': doc_id, 'n_tok': n_tok}).doc_id AS BIGINT)
             |      AS doc_id,
             |    CAST(MIN({'doc_id': doc_id, 'n_tok': n_tok}).n_tok AS BIGINT)
             |      AS n_tok
             |  FROM f
             |  GROUP BY ('0x' || substr(md5(text), 1, 15))::BIGINT),
             |a AS (SELECT doc_id, n_tok,
             |    $splitSql AS split,
             |    ('0x' || substr(md5('ep1:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
             |      % 8 AS shard
             |  FROM k)
             |SELECT split, shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
             |  MIN(doc_id) AS first_doc
             |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // PII scrub (the C4/Dolma pre-release stage): detect emails /
    // IPv4 / phone patterns, report per-doc counts, and emit the
    // redacted corpus (verified by md5 — the redacted TEXT is the
    // artifact; the hash keeps the compared output slim). The corpus
    // is synthetic word-salad with no PII, so the PII is woven in
    // deterministically from doc_id ON BOTH SIDES — the detection/
    // redaction regexes are the operator under test, not the data.
    // Pure codegen regexp chain (TextFns.redactPii), one map pass —
    // at 100 TB this runs inside the scan projection with nothing
    // shuffled but the audit counts.
    Q("q191_pii_scrub",
      (s, dir) => {
        val raw = concat(col("text"),
          lit(" contact user"), col("doc_id").cast(StringType),
          lit("@example.com"),
          when(pmod(col("doc_id"), lit(3)) === 0,
            concat(lit(" node 10."),
              pmod(col("doc_id"), lit(200)).cast(StringType), lit("."),
              pmod(col("doc_id"), lit(250)).cast(StringType), lit(".7")))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(5)) === 0,
            concat(lit(" call 555-"),
              lpad(pmod(col("doc_id"), lit(10000)).cast(StringType), 4, "0")))
            .otherwise(lit("")))
        Tables(s, dir, "documents")
          .select(col("doc_id"), raw.as("raw"))
          .select(col("doc_id"),
            TextFns.piiCount(col("raw"), TextFns.EmailRe).as("n_emails"),
            TextFns.piiCount(col("raw"), TextFns.Ipv4Re).as("n_ips"),
            TextFns.piiCount(col("raw"), TextFns.PhoneRe).as("n_phones"),
            md5(TextFns.redactPii(col("raw"))).as("redacted_md5"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH raw AS (SELECT doc_id,
             |    text || ' contact user' || CAST(doc_id AS VARCHAR)
             |      || '@example.com'
             |      || CASE WHEN doc_id % 3 = 0 THEN ' node 10.'
             |           || CAST(doc_id % 200 AS VARCHAR) || '.'
             |           || CAST(doc_id % 250 AS VARCHAR) || '.7'
             |         ELSE '' END
             |      || CASE WHEN doc_id % 5 = 0 THEN ' call 555-'
             |           || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
             |         ELSE '' END AS raw
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(len(regexp_extract_all(raw, '${TextFns.EmailRe}')) AS BIGINT)
             |    AS n_emails,
             |  CAST(len(regexp_extract_all(raw, '${TextFns.Ipv4Re}')) AS BIGINT)
             |    AS n_ips,
             |  CAST(len(regexp_extract_all(raw, '${TextFns.PhoneRe}')) AS BIGINT)
             |    AS n_phones,
             |  md5(regexp_replace(regexp_replace(regexp_replace(raw,
             |    '${TextFns.EmailRe}', '<EMAIL>', 'g'),
             |    '${TextFns.Ipv4Re}', '<IP>', 'g'),
             |    '${TextFns.PhoneRe}', '<PHONE>', 'g')) AS redacted_md5
             |FROM raw ORDER BY doc_id""".stripMargin)),

    // Gopher quality rules (Rae et al. 2021, arXiv:2112.11446 §A1.1 —
    // the standard rule-based pre-filter a pipeline runs BEFORE the
    // statistical quality models q25/q98): word-count bounds, mean
    // word length band, symbol-to-word ratio, bullet/ellipsis line
    // ratios, minimum distinct-stopword evidence. All integer-exact
    // (mean length in thousandths via the no-whitespace character
    // total — identical to Σ|token| under whitespace tokenization;
    // ratios per-1000), one map pass + nothing shuffled but the
    // per-doc verdict row.
    Q("q192_gopher_rules",
      (s, dir) => {
        val sw = TextFns.langStopwords.head._2
        val toks = TextFns.tokens(col("text"))
        val d = Tables(s, dir, "documents")
          .select(col("doc_id"), col("text"), toks.as("t"))
          .withColumn("n_words", size(col("t")).cast(LongType))
          .withColumn("sum_len",
            length(regexp_replace(col("text"),
              graft.functions.TextFns.WsClass, "")).cast(LongType))
          .withColumn("mwl_milli",
            expr("(sum_len * 1000) div greatest(n_words, 1L)"))
          .withColumn("n_sym", TextFns.piiCount(col("text"), "#|\\.\\.\\."))
          .withColumn("sym_per_1000",
            expr("(n_sym * 1000) div greatest(n_words, 1L)"))
          // Line-anchored counts run on \n-normalized text: Java's
          // MULTILINE treats \r, NEL and LS/PS as terminators while
          // RE2 (the oracle) only recognizes \n — both sides normalize
          // with the same pattern so (?m)^/$ agree byte-for-byte on
          // CRLF and Unicode-terminated text.
          .withColumn("nl_text", regexp_replace(col("text"),
            "\\r\\n|[\\r\\x{0085}\\x{2028}\\x{2029}]", "\n"))
          .withColumn("bullet_lines",
            TextFns.piiCount(col("nl_text"), "(?m)^[-*•]"))
          .withColumn("ellipsis_lines",
            TextFns.piiCount(col("nl_text"), "(?m)\\.\\.\\.$"))
          .withColumn("stop_hits",
            size(filter(array_distinct(col("t")),
              t => t.isin(sw: _*))).cast(LongType))
        d.select(col("doc_id"), col("n_words"), col("mwl_milli"),
            col("sym_per_1000"), col("bullet_lines"), col("ellipsis_lines"),
            col("stop_hits"),
            (col("n_words") >= 50 && col("n_words") <= 100000 &&
              col("mwl_milli") >= 3000 && col("mwl_milli") <= 10000 &&
              col("sym_per_1000") < 100 &&
              col("stop_hits") >= 2).as("keep"))
          .orderBy(col("doc_id"))
      },
      Some({
        val sw = TextFns.langStopwords.head._2.map("'" + _ + "'").mkString(",")
        s"""WITH d AS (SELECT doc_id, text,
           |    list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS t
           |  FROM documents),
           |m AS (SELECT doc_id,
           |    CAST(len(t) AS BIGINT) AS n_words,
           |    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT)
           |      AS sum_len,
           |    CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS BIGINT)
           |      AS n_sym,
           |    CAST(len(regexp_extract_all(regexp_replace(text,
           |      '\\r\\n|[\\r\\x{0085}\\x{2028}\\x{2029}]', chr(10), 'g'),
           |      '(?m)^[-*•]')) AS BIGINT)
           |      AS bullet_lines,
           |    CAST(len(regexp_extract_all(regexp_replace(text,
           |      '\\r\\n|[\\r\\x{0085}\\x{2028}\\x{2029}]', chr(10), 'g'),
           |      '(?m)\\.\\.\\.$$')) AS BIGINT)
           |      AS ellipsis_lines,
           |    CAST(len(list_filter(list_distinct(t), x -> x IN ($sw)))
           |      AS BIGINT) AS stop_hits
           |  FROM d)
           |SELECT doc_id, n_words,
           |  (sum_len * 1000) // greatest(n_words, 1) AS mwl_milli,
           |  (n_sym * 1000) // greatest(n_words, 1) AS sym_per_1000,
           |  bullet_lines, ellipsis_lines, stop_hits,
           |  n_words >= 50 AND n_words <= 100000
           |    AND (sum_len * 1000) // greatest(n_words, 1) BETWEEN 3000 AND 10000
           |    AND (n_sym * 1000) // greatest(n_words, 1) < 100
           |    AND stop_hits >= 2 AS keep
           |FROM m ORDER BY doc_id""".stripMargin
      })),

    // Exact precision/recall curve of a curation filter — the eval
    // harness every threshold-based filter needs BEFORE it gates a
    // corpus: sweep every achievable threshold of a score (here the
    // English-stopword density in basis points, q19's signal) against
    // a label (lang = 'en') and report TP/predicted-positive/
    // precision/recall at each operating point, all exact integers.
    // Scale shape: ONE corpus pass (map-side-combined per-score
    // cells); the cumulative sums run as a window over the CELL
    // table, whose size is bounded by the score DOMAIN (≤ 10,001
    // basis-point values — a bounded artifact, the PrefixSum-numParts
    // convention), never by the corpus. Docs with no tokens are
    // unscorable and excluded on both sides.
    Q("q195_pr_curve",
      (s, dir) => {
        val sw = TextFns.langStopwords.head._2
        val toks = TextFns.tokens(col("text"))
        val d = Tables(s, dir, "documents")
          .select(col("lang"), toks.as("t"))
          .withColumn("n_tok", size(col("t")).cast(LongType))
          .filter(col("n_tok") >= 1L)
          .withColumn("hits",
            size(filter(col("t"), t => t.isin(sw: _*))).cast(LongType))
          .select(expr("(hits * 10000) div n_tok").as("s"),
            when(col("lang") === "en", 1L).otherwise(0L).as("y"))
        val cells = d.groupBy(col("s"))
          .agg(count(lit(1)).cast(LongType).as("n"),
            sum(col("y")).cast(LongType).as("np"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("s").desc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        val tot = cells.agg(sum(col("np")).cast(LongType).as("pos"))
        cells
          .withColumn("pp", sum(col("n")).over(w))
          .withColumn("tp", sum(col("np")).over(w))
          .crossJoin(broadcast(tot))
          .select(col("s").as("threshold_bp"),
            col("pp"), col("tp"),
            expr("(tp * 10000) div pp").as("precision_bp"),
            expr("(tp * 10000) div pos").as("recall_bp"))
          .orderBy(col("threshold_bp"))
      },
      Some({
        val sw = TextFns.langStopwords.head._2.map("'" + _ + "'").mkString(",")
        s"""WITH d AS (SELECT lang,
           |    list_filter(string_split_regex(trim(text), '\\s+'),
           |      x -> x <> '') AS t
           |  FROM documents),
           |sc AS (SELECT
           |    (CAST(len(list_filter(t, x -> x IN ($sw))) AS BIGINT) * 10000)
           |      // CAST(len(t) AS BIGINT) AS s,
           |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
           |  FROM d WHERE len(t) >= 1),
           |cells AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(y) AS BIGINT) AS np
           |  FROM sc GROUP BY s),
           |tot AS (SELECT CAST(SUM(np) AS BIGINT) AS pos FROM cells),
           |cum AS (SELECT s,
           |    CAST(SUM(n) OVER (ORDER BY s DESC
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |      AS pp,
           |    CAST(SUM(np) OVER (ORDER BY s DESC
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |      AS tp
           |  FROM cells)
           |SELECT s AS threshold_bp, pp, tp,
           |  (tp * 10000) // pp AS precision_bp,
           |  (tp * 10000) // pos AS recall_bp
           |FROM cum, tot ORDER BY threshold_bp""".stripMargin
      })),

    // Gopher REPETITION rules (Rae et al. 2021, arXiv:2112.11446
    // §A1.1 — the other half of the rule table; q192 covers the
    // word/symbol/stopword rules): per document, the character mass
    // of the single most-frequent word 2-gram and the duplicate
    // fraction of word 5-grams — the signals that catch boilerplate
    // loops and template spam that per-token stats miss. Engine
    // quantization of the paper's fractions, integer-exact both
    // engines: top2_milli = chars covered by the modal 2-gram
    // (count × gram chars, space excluded) per-mille of the doc's
    // non-whitespace chars; rep5_milli = occurrences-beyond-first
    // per-mille of all 5-grams. Modal-gram ties break to the
    // lexicographically smallest gram (the min(struct) convention).
    // Shape at scale: ONE tagged union of the 2-/5-gram explodes →
    // a (doc, n, gram) wordcount (map-side combine collapses the
    // within-doc repeats that ARE the signal) → one doc-keyed
    // rollup; nothing wider than distinct-(doc,gram) crosses the
    // wire. Thresholds are Gopher's: top-2-gram mass < 20 %,
    // duplicate 5-grams < 15 %.
    Q("q197_gopher_repetition",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
          .select(col("doc_id"),
            length(regexp_replace(col("text"),
              graft.functions.TextFns.WsClass, ""))
              .cast(LongType).as("sum_len"),
            TextFns.shingles(col("text"), 2).as("g2"),
            TextFns.shingles(col("text"), 5).as("g5"))
        // ONE explode over the tagged concat of both gram arrays — a
        // union of two explodes would scan (and shingle) the corpus
        // twice. The tag derives from the POSITION (r15, §4-analog):
        // posexplode + a position/size comparison is whole-stage
        // codegen, where the previous per-gram struct-building
        // `transform` lambdas evaluated interpreted; concat preserves
        // order, so pos < |g2| ⇔ the gram came from g2.
        val grams = d.select(col("doc_id"), size(col("g2")).as("_n2"),
            posexplode(concat(col("g2"), col("g5"))).as(Seq("_p", "g")))
          .select(col("doc_id"),
            when(col("_p") < col("_n2"), lit(2)).otherwise(lit(5)).as("n"),
            col("g"))
        val a = grams.groupBy(col("doc_id"), col("n"), col("g"))
          .agg(count(lit(1)).cast(LongType).as("c"))
          .groupBy(col("doc_id"))
          .agg(
            sum(when(col("n") === 2, col("c"))).cast(LongType).as("n2"),
            min(when(col("n") === 2,
              struct((-col("c")).as("nc"), col("g").as("g")))).as("m2"),
            sum(when(col("n") === 5, col("c"))).cast(LongType).as("n5"),
            sum(when(col("n") === 5 && col("c") >= 2, col("c") - 1))
              .cast(LongType).as("dup5"))
        val top2Chars = ((-col("m2.nc")) *
          (length(col("m2.g")) - 1).cast(LongType)).cast(LongType)
        d.select(col("doc_id"), col("sum_len")).join(a, Seq("doc_id"), "left")
          .withColumn("top2_chars", top2Chars)
          .withColumn("top2_milli",
            expr("(top2_chars * 1000) div greatest(sum_len, 1L)"))
          .withColumn("rep5_milli",
            when(col("n5").isNotNull,
              expr("(coalesce(dup5, 0L) * 1000) div n5")))
          .select(col("doc_id"),
            coalesce(col("n2"), lit(0L)).as("n_2grams"),
            col("top2_chars"), col("top2_milli"),
            coalesce(col("n5"), lit(0L)).as("n_5grams"),
            col("rep5_milli"),
            (coalesce(col("top2_milli"), lit(0L)) < 200 &&
              coalesce(col("rep5_milli"), lit(0L)) < 150).as("keep"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (SELECT doc_id,
             |    list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> x <> '') AS t,
             |    CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT)
             |      AS sum_len
             |  FROM documents),
             |sh AS (
             |  SELECT doc_id, 2 AS n,
             |      array_to_string(list_slice(t, i, i + 1), ' ') AS g
             |    FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
             |    WHERE len(t) >= 2
             |  UNION ALL
             |  SELECT doc_id, 5,
             |      array_to_string(list_slice(t, i, i + 4), ' ')
             |    FROM toks, unnest(generate_series(1, len(t) - 4)) AS u(i)
             |    WHERE len(t) >= 5),
             |c AS (SELECT doc_id, n, g, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM sh GROUP BY 1, 2, 3),
             |a AS (SELECT doc_id,
             |    CAST(SUM(CASE WHEN n = 2 THEN c END) AS BIGINT) AS n2,
             |    min(CASE WHEN n = 2 THEN {'nc': -c, 'g': g} END) AS m2,
             |    CAST(SUM(CASE WHEN n = 5 THEN c END) AS BIGINT) AS n5,
             |    CAST(SUM(CASE WHEN n = 5 AND c >= 2 THEN c - 1 END) AS BIGINT)
             |      AS dup5
             |  FROM c GROUP BY doc_id),
             |j AS (SELECT d.doc_id, d.sum_len, n2, m2, n5, dup5,
             |    CAST((-m2.nc) * (length(m2.g) - 1) AS BIGINT) AS top2_chars
             |  FROM toks d LEFT JOIN a USING (doc_id))
             |SELECT doc_id,
             |  COALESCE(n2, 0) AS n_2grams,
             |  top2_chars,
             |  CAST((top2_chars * 1000) // greatest(sum_len, 1) AS BIGINT)
             |    AS top2_milli,
             |  COALESCE(n5, 0) AS n_5grams,
             |  CAST((COALESCE(dup5, 0) * 1000) // n5 AS BIGINT) AS rep5_milli,
             |  COALESCE((top2_chars * 1000) // greatest(sum_len, 1), 0) < 200
             |    AND COALESCE((COALESCE(dup5, 0) * 1000) // n5, 0) < 150
             |    AS keep
             |FROM j ORDER BY doc_id""".stripMargin))
  )
}
