package graft

import graft.queries.Registry
import org.apache.spark.sql.DataFrame

/** Registry-wide "DataFrame + Spark SQL" parity sweep: every
  * SQL-expressible registry query (= every query with a DuckDB oracle)
  * must ALSO run as Spark SQL text over the registered views and
  * produce the exact same result as the DataFrame implementation at
  * sf0.001.
  *
  * The oracle strings are DuckDB dialect; [[DuckToSpark]] applies the
  * mechanical renames (VARCHAR→STRING, list_*→array fns, unnest→
  * explode, `//`→DIV, epoch→unix_timestamp, path literals →
  * parquet.`path`, …) that account for almost the whole gap — the
  * queries themselves are ANSI-shaped on purpose. Queries whose
  * DuckDB text uses a construct Spark's parser lacks but whose
  * semantics are plain SQL run from a documented per-query Spark SQL
  * override (ASOF JOIN → banded join + ROW_NUMBER; the fixed-iteration
  * trainers → unrolled chained CTEs). What remains is the
  * [[SqlParitySpec.exclusions]] list: the UNION-distinct recursive
  * closure, whose iteration count is data-dependent — genuinely
  * inexpressible as Spark SQL text. Everything else must parse AND
  * match exactly.
  */
object DuckToSpark {

  /** Replace every `fn(args)` with `rewrite(args)` — paren-matched, so
    * nested calls inside `args` survive. */
  private def rewriteCall(sql: String, fn: String, rewrite: String => String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val at = sql.indexOf(fn + "(", i)
      if (at < 0) { out.append(sql.substring(i)); i = sql.length }
      else {
        out.append(sql.substring(i, at))
        var depth = 0
        var j = at + fn.length
        var end = -1
        while (end < 0 && j < sql.length) {
          sql.charAt(j) match {
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) end = j
            case _ =>
          }
          j += 1
        }
        require(end > 0, s"unbalanced parens after $fn in oracle SQL")
        // recurse into the args first: `fn(... fn(...) ...)` must
        // rewrite the INNER call too (the outer-call scan resumes
        // after `end`, so nested occurrences would otherwise survive)
        out.append(rewrite(
          rewriteCall(sql.substring(at + fn.length + 1, end), fn, rewrite)))
        i = end + 1
      }
    }
    out.toString
  }

  /** Split `args` on top-level commas (ignoring commas inside parens
    * or quotes). */
  private def splitArgs(args: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var inStr = false; var start = 0; var i = 0
    while (i < args.length) {
      args.charAt(i) match {
        case '\'' => inStr = !inStr
        case '(' if !inStr => depth += 1
        case ')' if !inStr => depth -= 1
        case ',' if !inStr && depth == 0 =>
          out += args.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += args.substring(start)
    out.map(_.trim).toSeq
  }

  /** `('0x' || X)::BIGINT` / `::INT` → `CAST(conv(X, 16, 10) AS …)` —
    * DuckDB casts 0x-prefixed hex strings to integers; Spark needs
    * conv(). */
  private def rewriteHexCast(sql: String): String = {
    val marker = "('0x' || "
    val out = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val at = sql.indexOf(marker, i)
      if (at < 0) { out.append(sql.substring(i)); i = sql.length }
      else {
        out.append(sql.substring(i, at))
        var depth = 1
        var j = at + marker.length
        var end = -1
        while (end < 0 && j < sql.length) {
          sql.charAt(j) match {
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) end = j
            case _ =>
          }
          j += 1
        }
        val inner = sql.substring(at + marker.length, end)
        val castTo =
          if (sql.regionMatches(end + 1, "::BIGINT", 0, 8)) "BIGINT"
          else if (sql.regionMatches(end + 1, "::INT", 0, 5)) "INT"
          else throw new IllegalArgumentException(
            s"expected ::BIGINT/::INT after hex concat at $at")
        out.append(s"CAST(conv($inner, 16, 10) AS $castTo)")
        i = end + 1 + 2 + castTo.length
      }
    }
    out.toString
  }

  /** `list_transform(list_zip(A, B), s -> BODY)` →
    * `zip_with(A, B, (zl, zr) -> BODY[s[1]:=zl, s[2]:=zr])`. */
  private def rewriteZip(sql: String): String =
    rewriteCall(sql, "list_transform", { args =>
      if (!args.trim.startsWith("list_zip(")) s"list_transform($args)"
      else {
        val Seq(zipExpr, lambda) = splitArgs(args)
        val zipArgs = splitArgs(
          zipExpr.trim.stripPrefix("list_zip(").stripSuffix(")"))
        val Array(v, body) = lambda.split("->", 2).map(_.trim)
        val newBody = body
          .replace(s"$v[1]", "zl").replace(s"$v[2]", "zr")
        s"zip_with(${zipArgs(0)}, ${zipArgs(1)}, (zl, zr) -> $newBody)"
      }
    })

  /** `FROM t, unnest(EXPR) AS u(i)` (DuckDB correlated lateral) →
    * `FROM t LATERAL VIEW explode(EXPR) u AS i`. */
  private def rewriteLateralUnnest(sql: String): String = {
    val marker = ", unnest("
    val out = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val at = sql.indexOf(marker, i)
      if (at < 0) { out.append(sql.substring(i)); i = sql.length }
      else {
        out.append(sql.substring(i, at))
        var depth = 1
        var j = at + marker.length
        var end = -1
        while (end < 0 && j < sql.length) {
          sql.charAt(j) match {
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) end = j
            case _ =>
          }
          j += 1
        }
        val inner = sql.substring(at + marker.length, end)
        val tail = sql.substring(end + 1)
        val asPat = "^\\s+AS\\s+(\\w+)\\((\\w+)\\)".r
        asPat.findFirstMatchIn(tail) match {
          case Some(m) =>
            out.append(s" LATERAL VIEW explode($inner) ${m.group(1)} AS ${m.group(2)}")
            i = end + 1 + m.end
          case None => // select-list unnest, leave for the rename rule
            out.append(sql.substring(at, end + 1))
            i = end + 1
        }
      }
    }
    out.toString
  }

  /** `{'a': X, 'b': Y}` (DuckDB struct literal, FLAT fields only) →
    * `named_struct('a', X, 'b', Y)`. */
  private def rewriteStructLiteral(sql: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val at = sql.indexOf("{'", i)
      if (at < 0) { out.append(sql.substring(i)); i = sql.length }
      else {
        out.append(sql.substring(i, at))
        var depth = 0; var j = at; var end = -1; var inStr = false
        while (end < 0 && j < sql.length) {
          val c = sql.charAt(j)
          if (c == '\'') inStr = !inStr
          else if (!inStr && c == '{') depth += 1
          else if (!inStr && c == '}') { depth -= 1; if (depth == 0) end = j }
          j += 1
        }
        require(end > 0, s"unbalanced struct literal at $at in oracle SQL")
        val fields = splitArgs(sql.substring(at + 1, end)).map { f =>
          val Array(k, v) = f.split(":", 2)
          s"${k.trim}, ${v.trim}"
        }
        out.append(s"named_struct(${fields.mkString(", ")})")
        i = end + 1
      }
    }
    out.toString
  }

  /** Bracket operations with a CALL base or a slice body —
    * `f(x)[i]` → `element_at(f(x), i)`,
    * `f(x)[a:b]` → `slice(...)` for list-producing bases
    * (string_split/split/list_*) or `substr(...)` otherwise (DuckDB
    * spells BOTH list and string slicing `[a:b]`; the base function
    * decides which). Plain identifier indexing (`toks[i]`) is left
    * for the later element_at regex renames. */
  private def rewriteBracketOps(sql: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val at = sql.indexOf('[', i)
      if (at < 0) { out.append(sql.substring(i)); i = sql.length }
      else {
        val prev = if (at == 0) ' ' else sql.charAt(at - 1)
        var depth = 0; var j = at; var end = -1; var inStr = false
        while (end < 0 && j < sql.length) {
          val c = sql.charAt(j)
          if (c == '\'') inStr = !inStr
          else if (!inStr && c == '[') depth += 1
          else if (!inStr && c == ']') { depth -= 1; if (depth == 0) end = j }
          j += 1
        }
        require(end > 0, s"unbalanced bracket at $at in oracle SQL")
        val content = sql.substring(at + 1, end)
        var d2 = 0; var colon = -1; var k = 0; var inS2 = false
        while (k < content.length) {
          val c = content.charAt(k)
          if (c == '\'') inS2 = !inS2
          else if (!inS2 && (c == '(' || c == '[')) d2 += 1
          else if (!inS2 && (c == ')' || c == ']')) d2 -= 1
          else if (!inS2 && c == ':' && d2 == 0) colon = k
          k += 1
        }
        val isCallBase = prev == ')'
        if (!isCallBase && colon < 0) {
          // identifier index (or a list literal with no base at all)
          out.append(sql.substring(i, end + 1)); i = end + 1
        } else {
          var b = at - 1
          if (isCallBase) {
            var pd = 0; var done = false
            while (!done && b >= 0) {
              sql.charAt(b) match {
                case ')' => pd += 1
                case '(' => pd -= 1; if (pd == 0) done = true
                case _ =>
              }
              if (!done) b -= 1
            }
            b -= 1
            while (b >= 0 && (sql.charAt(b).isLetterOrDigit ||
              sql.charAt(b) == '_' || sql.charAt(b) == '.')) b -= 1
            b += 1
          } else {
            while (b >= 0 && (sql.charAt(b).isLetterOrDigit ||
              sql.charAt(b) == '_' || sql.charAt(b) == '.')) b -= 1
            b += 1
          }
          val base = sql.substring(b, at)
          out.append(sql.substring(i, b))
          if (colon < 0) out.append(s"element_at($base, $content)")
          else {
            val from = content.substring(0, colon).trim
            val to = content.substring(colon + 1).trim
            val isList = base.startsWith("string_split(") ||
              base.startsWith("split(") || base.startsWith("list_")
            if (isList) out.append(s"slice($base, $from, ($to) - ($from) + 1)")
            else out.append(s"substr($base, $from, ($to) - ($from) + 1)")
          }
          i = end + 1
        }
      }
    }
    out.toString
  }

  def translate(duck: String): String = {
    var s = duck
    // Spark string literals treat backslash as an escape (\s → s);
    // DuckDB's don't. Backslashes only occur inside regex literals in
    // the oracle corpus, so double them all.
    s = s.replace("\\", "\\\\")
    // structural rewrites first (they reference the DuckDB names)
    s = rewriteStructLiteral(s)
    s = rewriteLateralUnnest(s)
    s = rewriteZip(s)
    s = rewriteHexCast(s)
    s = rewriteBracketOps(s)
    // empty typed list literals (before the VARCHAR→STRING type rename)
    s = s.replace("CAST([] AS VARCHAR[])", "CAST(array() AS ARRAY<STRING>)")
    s = s.replace("CAST([] AS INTEGER[])", "CAST(array() AS ARRAY<INT>)")
    s = s.replace("CAST([] AS BIGINT[])", "CAST(array() AS ARRAY<BIGINT>)")
    s = rewriteCall(s, "string_split", { a =>
      // Spark's split() delimiter is a REGEX; escape metacharacters in
      // literal delimiters ('.' would otherwise split every char).
      // The backslash-doubling pass already ran, so emit Spark-ready
      // escapes directly.
      val parts = splitArgs(a)
      val delim = parts(1)
      val escaped =
        if (delim.length >= 2 && delim.head == '\'' && delim.last == '\'')
          "'" + delim.substring(1, delim.length - 1)
            .flatMap(c => if (".^$|?*+()[]{}".contains(c)) s"\\\\$c" else c.toString) + "'"
        else delim
      s"split(${parts(0)}, $escaped)"
    })
    s = rewriteCall(s, "time_bucket", { a =>
      // time_bucket(INTERVAL 'N minutes', ts): epoch-aligned floor
      // (DuckDB's 2000-01-03 origin is a whole number of N-minute
      // buckets after the epoch for the corpus's N)
      val Seq(interval, ts) = splitArgs(a)
      val m = "INTERVAL '(\\d+) minutes?'".r.findFirstMatchIn(interval)
        .getOrElse(throw new IllegalArgumentException(s"time_bucket($interval)"))
      val secs = m.group(1).toInt * 60
      s"timestamp_seconds((unix_timestamp($ts) DIV $secs) * $secs)"
    })
    s = rewriteCall(s, "string_agg", { a =>
      // in-aggregate ORDER BY (any expression) → WITHIN GROUP
      val parts = splitArgs(a)
      if (parts.size == 2 && parts(1).contains(" ORDER BY ")) {
        val Array(sep, key) = parts(1).split(" ORDER BY ", 2)
        s"string_agg(${parts(0)}, ${sep.trim}) WITHIN GROUP (ORDER BY ${key.trim})"
      } else s"string_agg($a)"
    })
    // `k * INTERVAL 'N minutes'` (day-time interval scaling)
    s = s.replaceAll("\\b([a-z_][a-z_0-9.]*) \\* INTERVAL '(\\d+) minutes?'",
      "make_dt_interval(0, 0, ($1) * $2, 0)")
    s = rewriteCall(s, "list_slice", { a =>
      // DuckDB list_slice(l, a, b) is 1-based inclusive; Spark slice
      // takes (l, start, length)
      val Seq(l, from, to) = splitArgs(a)
      s"slice($l, $from, ($to) - ($from) + 1)"
    })
    s = rewriteCall(s, "range", { a =>
      // DuckDB range is end-EXCLUSIVE; Spark sequence is inclusive
      splitArgs(a) match {
        case Seq(from, to)       => s"sequence($from, ($to) - 1)"
        case Seq(from, to, step) => s"sequence($from, ($to) - 1, $step)"
        case Seq(to)             => s"sequence(0, ($to) - 1)"
        case other => throw new IllegalArgumentException(s"range(${other.size} args)")
      }
    })
    s = rewriteCall(s, "regexp_replace", { a =>
      // Spark regexp_replace is always global; drop DuckDB's 'g' flag
      val parts = splitArgs(a)
      if (parts.size == 4 && parts(3) == "'g'")
        s"regexp_replace(${parts(0)}, ${parts(1)}, ${parts(2)})"
      else if (parts.size == 4 && parts(3) == "'gs'")
        // global is Spark's default; dotall becomes an inline flag
        s"regexp_replace(${parts(0)}, concat('(?s)', ${parts(1)}), ${parts(2)})"
      else s"regexp_replace($a)"
    })
    s = rewriteCall(s, "regexp_extract_all", { a =>
      // Spark defaults the group index to 1; DuckDB (and the intent
      // here) is the whole match
      val parts = splitArgs(a)
      if (parts.size == 2) s"regexp_extract_all(${parts(0)}, ${parts(1)}, 0)"
      else s"regexp_extract_all($a)"
    })
    s = rewriteCall(s, "xor", { a =>
      val Seq(x, y) = splitArgs(a); s"(($x) ^ ($y))"
    })
    // type + operator spellings
    s = s.replaceAll("\\bVARCHAR\\b", "STRING")
    s = s.replaceAll("\\bHUGEINT\\b", "DECIMAL(38,0)") // 128-bit int ≈ decimal-38
    // `//` → DIV, but never inside a string literal (URLs contain //)
    s = {
      val sb = new StringBuilder; var inStr = false; var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\'') { inStr = !inStr; sb.append(c); i += 1 }
        else if (!inStr && c == '/' && i + 1 < s.length && s.charAt(i + 1) == '/') {
          sb.append("DIV"); i += 2
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }
    // scalar/date functions
    s = s.replaceAll("\\bepoch_ns\\(([A-Za-z_.]+)\\)", "(unix_micros($1) * 1000)")
    s = s.replaceAll("\\bepoch_us\\(", "unix_micros(")
    // bracket array literal over simple expressions: [k, k + 1] → array(...)
    s = s.replaceAll("\\[([A-Za-z_][A-Za-z_0-9]*(?: [-+] \\d+)?(?:, [A-Za-z_][A-Za-z_0-9]*(?: [-+] \\d+)?)+)\\]", "array($1)")
    // ... and over integer-literal lists: [1, 2, 4] → array(1, 2, 4)
    // (the empty typed lists above are handled by their own rule)
    s = s.replaceAll("\\[(\\d+(?:, \\d+)+)\\]", "array($1)")
    s = s.replaceAll("\\bepoch\\(", "unix_timestamp(")
    s = s.replaceAll("\\bdatediff\\('(\\w+)',", "datediff($1,")
    // DuckDB dayofweek is 0-based (Sun=0); Spark's is 1-based (Sun=1)
    s = s.replaceAll("\\bdayofweek\\(([A-Za-z_.]+)\\) \\+ 1", "dayofweek($1)")
    s = s.replaceAll("\\bprintf\\(", "format_string(")
    s = s.replaceAll("\\bjson_extract_string\\(", "get_json_object(")
    s = s.replaceAll("\\bquantile_cont\\(", "percentile(")
    s = s.replaceAll("\\bstrpos\\(", "instr(")
    s = s.replaceAll("\\bstrlen\\(", "octet_length(")
    s = s.replaceAll("\\bgenerate_series\\(", "sequence(")
    s = s.replaceAll("\\bregexp_matches\\(", "regexp_like(")
    s = s.replaceAll("\\bto_hex\\(", "hex(") // always lower()-wrapped in the corpus
    // lower(strip_accents(x)) ≡ normalize_text(x) (NFD strip + lower);
    // the outer lower() then no-ops
    s = s.replaceAll("\\bstrip_accents\\(", "normalize_text(")
    // list functions → array functions (same arg order, same lambdas)
    s = s.replaceAll("\\blist_filter\\(", "filter(")
    s = s.replaceAll("\\blist_transform\\(", "transform(")
    s = s.replaceAll("\\blist_max\\(", "array_max(")
    s = s.replaceAll("\\blist_sort\\(", "array_sort(")
    s = s.replaceAll("\\blist_distinct\\(", "array_distinct(")
    s = s.replaceAll("\\blist_contains\\(", "array_contains(")
    s = s.replaceAll("\\blist_position\\(", "array_position(")
    s = s.replaceAll("\\blist_intersect\\(", "array_intersect(")
    s = s.replaceAll("\\barray_to_string\\(", "array_join(")
    s = s.replaceAll("\\bstring_split_regex\\(", "split(")
    // string_split's literal delimiters in the corpus (' ', chr(10))
    // are regex-safe, so split() is equivalent
    s = s.replaceAll("\\bstring_split\\(", "split(")
    s = s.replaceAll("\\bunnest\\(", "explode(")
    // len() is DuckDB's length for BOTH strings and lists; the oracles
    // only apply it to lists (string length is written length())
    s = s.replaceAll("\\blen\\(", "size(")
    // aggregates / folds that need argument surgery
    s = rewriteCall(s, "list_sum",
      a => s"aggregate($a, CAST(0 AS BIGINT), (acc, x) -> acc + x)")
    // 2-arg list_reduce folds with the FIRST ELEMENT as initial
    // accumulator; Spark's aggregate takes an explicit init, so seed
    // it with element 1 and fold the tail (empty-tail slice length is
    // clamped to 0, which returns the seed — DuckDB's 1-element case)
    s = rewriteCall(s, "list_reduce", { a =>
      val parts = splitArgs(a)
      if (parts.size == 2) {
        val l = parts(0)
        s"aggregate(slice($l, 2, greatest(size($l) - 1, 0)), " +
          s"element_at($l, 1), ${parts(1)})"
      } else s"list_reduce($a)"
    })
    // bare list() aggregate (collect; order restored by a later
    // list_sort in the corpus)
    s = s.replaceAll("\\blist\\(", "collect_list(")
    s = rewriteCall(s, "sha256", a => s"sha2($a, 256)")
    // window IGNORE NULLS sits inside the call parens in DuckDB,
    // outside in Spark
    s = s.replaceAll("\\s+IGNORE NULLS\\)", ") IGNORE NULLS")
    // (in-aggregate ORDER BY is handled structurally by the
    // string_agg rewriteCall above)
    // element indexing + list literals (after the list_* renames so we
    // only see value-position brackets)
    // DuckDB indexing is 1-based for both literal and variable
    // indices; Spark brackets are 0-based, element_at is 1-based
    s = s.replaceAll("\\b([A-Za-z_]+)\\[(-?\\d+)\\]", "element_at($1, $2)")
    s = s.replaceAll("\\b([A-Za-z_]+)\\[([a-z_][a-z_0-9]*)\\]", "element_at($1, $2)")
    // identifier indexed by simple offset arithmetic (`toks[i + 1]`)
    s = s.replaceAll("\\b([A-Za-z_]+)\\[([a-z_][a-z_0-9]* [+-] \\d+)\\]",
      "element_at($1, $2)")
    // list literals ONLY: brackets of comma-separated simple-word
    // strings (anything looser spans [..] embedded in JSON string
    // literals — quote pairing in SQL text differs from regex intuition)
    s = s.replaceAll("\\[\\s*('[a-z0-9_]*'(\\s*,\\s*'[a-z0-9_]*')*)\\s*\\]", "array($1)")
    // DuckDB reads bare parquet path literals; Spark needs the
    // parquet.`path` table syntax
    s = s.replaceAll("(FROM|JOIN)\\s+'([^']+\\.parquet)'", "$1 parquet.`$2`")
    s
  }
}

class SqlParitySpec extends SparkSpec {

  /** Constructs DuckDB supports that Spark SQL genuinely lacks — each
    * is exactly the gap a custom operator or DataFrame formulation
    * fills, so the exclusion documents WHY the engine surface exists. */
  private val exclusions: Map[String, String] = Map(
    "q41_cluster_unify" -> "recursive CTE termination needs UNION distinct; Spark recursion is UNION ALL only, and the iteration count (graph diameter) is data-dependent so unrolling is impossible (the ClusterUnify operator exists for exactly this)",
    "q86_dedup_survivors" -> "same UNION-distinct recursive closure as q41 (ClusterUnify fills the gap)",
    "q163_er_resolve" -> "same UNION-distinct recursive closure as q41/q86 over the fuzzy-match name graph (ClusterUnify.components fills the gap)")

  /** Spark SQL texts for queries whose DuckDB oracle leans on a
    * construct Spark's PARSER lacks, but whose SEMANTICS are plain
    * SQL — so the engine surface stays SQL-expressible and the sweep
    * verifies it instead of excluding it:
    *   - q53: DuckDB's ASOF LEFT JOIN is syntactic sugar for "latest
    *     right row at or before" — a banded left join + ROW_NUMBER
    *     picks the same row (ties by max right id, matching
    *     AsOfJoin's last-wins carry).
    *   - q102/q103/q106: DuckDB replays the trainers/power method as
    *     recursive CTEs that aggregate over the recursive reference —
    *     Spark recursion forbids that, but all three run a FIXED
    *     iteration count that is part of the query definition, so the
    *     loop unrolls faithfully into chained CTEs (generated, one
    *     block per iteration).
    * Each override is compared against the DataFrame implementation
    * exactly like a translated oracle. */
  private lazy val sparkOverrides: Map[String, String] = Map(
    "q53_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, ts
        |  FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, ts, MAX(event_id) AS view_id
        |  FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
        |j AS (SELECT p.event_id, p.user_id, v.view_id,
        |    ROW_NUMBER() OVER (PARTITION BY p.event_id
        |      ORDER BY v.ts DESC NULLS LAST, v.view_id DESC NULLS LAST) AS rn
        |  FROM p LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts)
        |SELECT event_id, user_id, view_id FROM j WHERE rn = 1
        |ORDER BY event_id""".stripMargin,
    "q102_bpe_train" -> bpeUnrolled(16),
    "q103_semdedup_trained" -> kmeansUnrolled(iters = 3, k = 8),
    "q106_pagerank" -> pagerankUnrolled(5))

  /** q102 unrolled: wordcount → char-split init, then ONE CTE per merge
    * step. Spark inlines CTEs (no materialization), so a step that
    * references its predecessor twice — once for the pair argmax, once
    * for the rows — doubles the inlined plan per level: 2^16 blowup.
    * Instead each step references its predecessor exactly once and
    * carries the winning pair ON the rows: explode adjacent pairs
    * (outer, so pairless words survive), count by a partition window,
    * pick the global argmax by an unbounded window with the
    * (n DESC, pair) tie-break, DISTINCT back to one row per word, then
    * scanner-fold the re-encode with aggregate() (list_reduce's
    * explicit-init form). The pair is kept as `l SEP2 r`; comparing
    * that string equals comparing (l, r) because SEP2 sorts below
    * every token character. */
  private def bpeUnrolled(iters: Int): String = {
    val d1 = "chr(1)"
    val d2 = "chr(2)"
    val sb = new StringBuilder
    sb ++= s"""WITH wf AS (
      |  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
      |    SELECT explode(filter(split(trim(text), '\\\\s+'), x -> x <> '')) AS word
      |    FROM documents) GROUP BY word),
      |t0 AS (SELECT word, freq,
      |  substr(regexp_replace(word, '(.)', concat($d1, '$$1')), 2) AS enc,
      |  CAST(array() AS ARRAY<STRING>) AS hist FROM wf)""".stripMargin
    for (k <- 0 until iters) {
      sb ++= s""",
      |t${k + 1} AS (
      |  SELECT word, freq,
      |    substr(aggregate(split(enc, $d1), $d2,
      |      (acc, x) -> CASE
      |        WHEN endswith(acc, concat($d1, element_at(split(bp, $d2), 1)))
      |          AND x = element_at(split(bp, $d2), 2)
      |        THEN concat(acc, x) ELSE concat(acc, $d1, x) END), 3) AS enc,
      |    array_append(hist, bp) AS hist
      |  FROM (
      |    SELECT DISTINCT word, freq, enc, hist,
      |      FIRST_VALUE(p) OVER (ORDER BY n DESC NULLS LAST, p
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS bp
      |    FROM (
      |      SELECT word, freq, enc, hist, p,
      |        CASE WHEN p IS NULL THEN NULL
      |          ELSE SUM(freq) OVER (PARTITION BY p) END AS n
      |      FROM (SELECT word, freq, enc, hist, split(enc, $d1) AS toks FROM t$k)
      |      LATERAL VIEW OUTER explode(
      |        CASE WHEN size(toks) >= 2 THEN transform(sequence(1, size(toks) - 1),
      |          i -> concat(element_at(toks, i), $d2, element_at(toks, i + 1)))
      |        ELSE CAST(array() AS ARRAY<STRING>) END) u AS p
      |    )
      |  )
      |)""".stripMargin
    }
    sb ++= s"""
      |SELECT CAST(pos AS BIGINT) AS rank,
      |  element_at(split(m, $d2), 1) AS `left`,
      |  element_at(split(m, $d2), 2) AS `right`
      |FROM (SELECT hist FROM t$iters LIMIT 1)
      |LATERAL VIEW posexplode(hist) u AS pos, m
      |ORDER BY rank""".stripMargin
    sb.toString
  }

  /** q106 unrolled: one CTE per power iteration, each referencing its
    * predecessor exactly once (the join-aggregate over the symmetrized
    * edge set regenerates the full node list every step). */
  private def pagerankUnrolled(iters: Int): String = {
    val base = "CAST(1000000000000 AS BIGINT) DIV nn.n"
    val sb = new StringBuilder
    sb ++= s"""WITH ce AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS sup
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
      |edges AS (SELECT 'c' AS st, c AS sk, 's' AS dt, sup AS dk FROM ce
      |  UNION ALL SELECT 's', sup, 'c', c FROM ce),
      |deg AS (SELECT st, sk, CAST(COUNT(*) AS BIGINT) AS outdeg
      |  FROM edges GROUP BY st, sk),
      |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
      |t0 AS (SELECT st AS nt, sk AS nk, outdeg, $base AS score
      |  FROM deg CROSS JOIN nn)""".stripMargin
    for (i <- 0 until iters) {
      sb ++= s""",
      |t${i + 1} AS (
      |  SELECT e.dt AS nt, e.dk AS nk, d2.outdeg,
      |    (15 * ($base)) DIV 100
      |      + (85 * SUM(t$i.score DIV t$i.outdeg)) DIV 100 AS score
      |  FROM t$i
      |  JOIN edges e ON e.st = t$i.nt AND e.sk = t$i.nk
      |  JOIN deg d2 ON d2.st = e.dt AND d2.sk = e.dk
      |  CROSS JOIN nn
      |  GROUP BY e.dt, e.dk, d2.outdeg, nn.n)""".stripMargin
    }
    sb ++= s"""
      |SELECT nt AS node_type, nk AS node_key, score FROM t$iters
      |ORDER BY node_type, node_key""".stripMargin
    sb.toString
  }

  // exact scaled-long dot/norm — the Spark spellings of
  // VectorQueries.dotSql/normSql (zip_with/transform + aggregate fold)
  private def dotS(a: String, b: String): String =
    s"CAST(aggregate(zip_with($a, $b, (zl, zr) -> " +
      s"CAST(round(CAST(zl AS DOUBLE) * CAST(zr AS DOUBLE) * 1e10, 0) AS BIGINT)), " +
      s"CAST(0 AS BIGINT), (acc, x) -> acc + x) AS BIGINT)"
  private def normS(a: String): String =
    s"CAST(aggregate(transform($a, x -> " +
      s"CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e10, 0) AS BIGINT)), " +
      s"CAST(0 AS BIGINT), (acc, x) -> acc + x) AS BIGINT)"
  private def l2S(a: String, b: String): String =
    s"(${normS(a)} - 2 * ${dotS(a, b)} + ${normS(b)})"

  /** q103 unrolled: min-id init, then one Lloyd step (argmin
    * assignment + exact scaled-long per-dimension means, empty cells
    * keep their centroid) per CTE block, then the SemDeDup
    * assign/pair/drop tail — the DuckDB recursive oracle with the
    * recursion flattened. */
  private def kmeansUnrolled(iters: Int, k: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH c0 AS (SELECT vec_id AS cell_id,
      |  transform(embedding, x -> CAST(x AS DOUBLE)) AS cell_vec
      |  FROM embeddings WHERE vec_id < $k)""".stripMargin
    for (i <- 0 until iters) {
      sb ++= s""",
      |c${i + 1} AS (
      |  SELECT t.cell_id, coalesce(m.nv, t.cell_vec) AS cell_vec
      |  FROM c$i t LEFT JOIN (
      |    SELECT cid, transform(array_sort(collect_list(struct(i, v))),
      |      s -> s.v) AS nv FROM (
      |      SELECT cid, i, round(CAST(CAST(SUM(xs) AS BIGINT) AS DOUBLE)
      |          / CAST(COUNT(*) AS DOUBLE) / 1e10, 6) AS v
      |      FROM (
      |        SELECT a.cid, u.i,
      |          CAST(round(CAST(element_at(a.embedding, u.i) AS DOUBLE) * 1e10, 0) AS BIGINT) AS xs
      |        FROM (SELECT vec_id, embedding, cid FROM (
      |            SELECT e.vec_id, e.embedding, c.cell_id AS cid,
      |              ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |                ORDER BY ${l2S("e.embedding", "c.cell_vec")}, c.cell_id) AS rn
      |            FROM embeddings e CROSS JOIN c$i c) s WHERE rn = 1) a
      |        LATERAL VIEW explode(sequence(1, size(a.embedding))) u AS i
      |      ) GROUP BY cid, i
      |    ) GROUP BY cid
      |  ) m ON m.cid = t.cell_id)""".stripMargin
    }
    sb ++= s""",
      |cent AS (SELECT cell_id, cell_vec FROM c$iters),
      |v AS (SELECT vec_id, embedding AS ev FROM embeddings),
      |assigned AS (SELECT vec_id, ev, cell_id FROM (
      |    SELECT v.vec_id, v.ev, cent.cell_id,
      |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
      |        ORDER BY ${l2S("ev", "cell_vec")}, cell_id) AS arn
      |    FROM v CROSS JOIN cent) t2 WHERE arn = 1),
      |pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |    CASE WHEN ${normS("a.ev")} = 0 OR ${normS("b.ev")} = 0 THEN NULL
      |      ELSE CAST(${dotS("a.ev", "b.ev")} AS DOUBLE)
      |        / sqrt(CAST(${normS("a.ev")} AS DOUBLE) * CAST(${normS("b.ev")} AS DOUBLE)) END AS cosine
      |  FROM assigned a JOIN assigned b
      |    ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id),
      |dropped AS (SELECT DISTINCT id_b FROM pairs WHERE cosine >= 0.35)
      |SELECT a.vec_id, a.cell_id,
      |  CAST(CASE WHEN d.id_b IS NULL THEN 1 ELSE 0 END AS INT) AS kept
      |FROM assigned a LEFT JOIN dropped d ON a.vec_id = d.id_b
      |ORDER BY a.vec_id""".stripMargin
    sb.toString
  }

  private def canon(df: DataFrame): (Seq[String], Seq[Seq[String]]) = {
    val cols = df.columns.sorted.toSeq
    // sort key joins on \u0000 (can't appear in the data): a bare
    // mkString("") would collide distinct rows — ("ab","c") vs
    // ("a","bc") — leaving equal-key rows in engine-dependent order
    val rows = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(_.toSeq.map(String.valueOf).toSeq).toSeq
      .sortBy(_.mkString("\u0000"))
    (cols, rows)
  }

  test("every SQL-expressible registry query also runs as Spark SQL text") {
    GraftFunctions.registerAll(spark)
    GraftFunctions.registerViews(spark, sf001)
    // q102's unrolled trainer chains 33 CTEs — fixed-point analysis
    // needs more resolution rounds than the 100 default (a limit on
    // statement size, not semantics)
    spark.conf.set("spark.sql.analyzer.maxIterations", "500")
    val candidates = Registry.all.filter(q => q.oracle.isDefined)
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    var swept = 0
    candidates.foreach { q =>
      exclusions.get(q.name) match {
        case Some(_) => () // documented dialect gap
        case None =>
          try {
            val sqlText = sparkOverrides.getOrElse(q.name,
              DuckToSpark.translate(q.oracle.get))
            val viaSql = canon(spark.sql(sqlText))
            val viaDf = canon(q.run(spark, sf001))
            if (viaSql != viaDf)
              failures += s"${q.name}: MISMATCH sql=${viaSql._2.size} rows df=${viaDf._2.size} rows" +
                viaSql._2.zip(viaDf._2).find { case (a, b) => a != b }
                  .map { case (a, b) => s"\n  first diff:\n  sql=$a\n  df =$b" }
                  .getOrElse(s"\n  cols sql=${viaSql._1} df=${viaDf._1}")
            else swept += 1
          } catch {
            case e: Throwable =>
              failures += s"${q.name}: ${e.getClass.getSimpleName}: " +
                e.getMessage.linesIterator.take(3).mkString(" | ").take(300)
          }
      }
    }
    assert(failures.isEmpty, s"\n${failures.size} SQL-text parity failures:\n" +
      failures.mkString("\n"))
    // the sweep must actually cover the registry, not exclude it away
    assert(swept >= candidates.size - exclusions.size,
      "swept fewer queries than candidates minus exclusions")
    info(s"parity held for $swept queries; ${exclusions.size} documented exclusions")
  }
}
