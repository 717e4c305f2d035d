package graft.queries

import graft.functions.CleanFns
import graft.operators.TopKPerGroup
import graft.util.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational core: scans, filters, aggregations, joins (equi / semi /
  * anti / broadcast-dim), unions, distinct, windows, rollup —
  * SURVEY §2.2/2.4/2.5/2.6/2.7/2.8 re-expressed over the driver test
  * tables. Every query is a single declarative plan: Catalyst pushes
  * filters/projections into the parquet scans and AQE picks
  * broadcast/skew strategies at runtime.
  */
object CoreQueries {

  private val ts = (s: String) => lit(java.sql.Timestamp.valueOf(s + " 00:00:00"))

  /** Exact money arithmetic: accumulate as DECIMAL, emit as DOUBLE so
    * results are independent of partial-aggregation order and
    * bit-reproducible by the DuckDB oracle. */
  private def dsum(c: org.apache.spark.sql.Column, scale: Int = 2) =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  val all: Seq[Q] = Seq(

    // A1-style grouped aggregation (TPC-H Q1 shape): the reference's
    // category stats agg (process_pois.py:503-507) over lineitem.
    Q("q01_pricing_summary",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
          .filter(col("l_shipdate") <= ts("1998-09-02"))
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            sum((col("l_extendedprice") * (lit(1d) - col("l_discount")))
              .cast(DecimalType(18, 4))).cast(DoubleType).as("sum_disc_price"),
            count(lit(1)).as("n_rows"),
            (sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType) /
              count(lit(1))).as("avg_qty"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
             |  COUNT(*) AS n_rows,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      headline = true),

    // P1/P2-style predicate + projection; Catalyst pushes both into the
    // parquet scan (PushedFilters + pruned ReadSchema).
    Q("q02_filter_project",
      (s, dir) => Tables(s, dir, "lineitem")
        .filter(col("l_quantity") > 45 && col("l_discount") >= 0.05 &&
          col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1998-01-01"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_returnflag"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
             |FROM lineitem
             |WHERE l_quantity > 45 AND l_discount >= 0.05
             |  AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // J3/J4: fact ⋈ broadcast dims chain, revenue rollup by region/nation.
    Q("q03_revenue_by_nation",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        val c = Tables(s, dir, "customer")
        val n = Tables(s, dir, "nation")
        val r = Tables(s, dir, "region")
        o.join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(dsum(col("o_totalprice")).as("revenue"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some("""SELECT r_name, n_name,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             |  COUNT(*) AS n_orders
             |FROM orders
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name
             |ORDER BY r_name, n_name""".stripMargin),
      headline = true),

    // J7 existence semi-join (viewer's EXISTS predicate, server.py:196).
    Q("q04_semi_join",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        val o = Tables(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
             |ORDER BY c_custkey""".stripMargin)),

    // J6 anti-join (the soft-delete / NOT IN batch decision,
    // loader_v2.py:211-220).
    Q("q05_anti_join",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        val o = Tables(s, dir, "orders").filter(col("o_totalprice") > 300000)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
             |ORDER BY c_custkey""".stripMargin)),

    // T1/T2: distributed top-k per group (window + row_number), the
    // one-job replacement for the reference's per-key ORDER BY LIMIT
    // round-trips (cl_test1.py:90-98).
    Q("q06_topk_per_group",
      (s, dir) => TopKPerGroup(
        Tables(s, dir, "orders"),
        groupBy = Seq(col("o_custkey")),
        orderBy = Seq(col("o_totalprice").desc, col("o_orderkey")),
        k = 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rnk"))
        .orderBy(col("o_custkey"), col("rnk")),
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    ROW_NUMBER() OVER (PARTITION BY o_custkey
             |      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
             |  FROM orders) t
             |WHERE rnk <= 3
             |ORDER BY o_custkey, rnk""".stripMargin),
      headline = true),

    // U1/U2-style tagged union (PBF layer union, process_pois.py:364-378).
    Q("q07_union_tagged",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        val open = o.filter(col("o_orderstatus") === "O")
          .select(col("o_orderkey"), lit("open").as("bucket"))
        val done = o.filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), lit("done").as("bucket"))
        open.unionByName(done).orderBy(col("o_orderkey"), col("bucket"))
      },
      Some("""SELECT o_orderkey, 'open' AS bucket FROM orders WHERE o_orderstatus = 'O'
             |UNION ALL
             |SELECT o_orderkey, 'done' AS bucket FROM orders WHERE o_orderstatus = 'F'
             |ORDER BY o_orderkey, bucket""".stripMargin)),

    // P7 distinct projection.
    Q("q08_distinct",
      (s, dir) => Tables(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_nationkey")).distinct()
        .orderBy(col("c_mktsegment"), col("c_nationkey")),
      Some("""SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
             |ORDER BY c_mktsegment, c_nationkey""".stripMargin)),

    // §2.8 analytic window: per-supplier running quantity. Explicit
    // ROWS frame + unique ordering keys (ties would make RANGE frames
    // non-deterministic).
    Q("q09_running_sum",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        Tables(s, dir, "lineitem")
          .filter(col("l_suppkey") <= 10)
          .withColumn("running_qty",
            sum(col("l_quantity").cast(DecimalType(18, 2))).over(w).cast(DoubleType))
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("running_qty"))
          .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
             |    PARTITION BY l_suppkey
             |    ORDER BY l_shipdate, l_orderkey, l_linenumber
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
             |FROM lineitem WHERE l_suppkey <= 10
             |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin)),

    // F13-shape keyword classifier (loader_v2.py:181-185) applied to
    // part types, then aggregated.
    Q("q10_keyword_classify",
      (s, dir) => Tables(s, dir, "part")
        .withColumn("type_id",
          when(lower(col("p_type")).contains("brass"), lit(3))
            .when(lower(col("p_type")).contains("steel"), lit(2))
            .otherwise(lit(1)))
        .groupBy(col("type_id"))
        .agg(count(lit(1)).as("n_parts"),
          dsum(col("p_retailprice")).as("sum_price"))
        .orderBy(col("type_id")),
      Some("""SELECT CASE WHEN lower(p_type) LIKE '%brass%' THEN 3
             |            WHEN lower(p_type) LIKE '%steel%' THEN 2
             |            ELSE 1 END AS type_id,
             |  COUNT(*) AS n_parts,
             |  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             |FROM part GROUP BY 1 ORDER BY type_id""".stripMargin)),

    // F5/F7 content hash for change detection (loader_v2.py:84-88):
    // decimal-string rendering keeps double formatting out of the hash.
    Q("q11_content_hash",
      (s, dir) => Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          sha2(concat_ws("|",
            col("o_orderkey").cast(StringType),
            col("o_orderstatus"),
            col("o_totalprice").cast(DecimalType(18, 2)).cast(StringType),
            col("o_orderpriority")), 256).as("content_hash"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
             |  sha256(CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus || '|' ||
             |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) || '|' || o_orderpriority)
             |    AS content_hash
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // Grouping-sets surface (SURVEY §2.5 note): rollup with NULL
    // indicators coalesced identically on both sides.
    Q("q12_rollup",
      (s, dir) => Tables(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n_rows"), col("sum_qty"))
        .orderBy(col("returnflag"), col("linestatus")),
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
             |       coalesce(l_linestatus, 'ALL') AS linestatus,
             |       COUNT(*) AS n_rows,
             |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem
             |GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY returnflag, linestatus""".stripMargin)),

    // F1-F4 cleaning chain over deterministically dirtied strings —
    // exercises multi-dot repair, currency heuristic, caps, junk.
    Q("q13_clean_price",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        val decStr = col("o_totalprice").cast(DecimalType(18, 2)).cast(StringType)
        val dirty = when(col("o_orderkey") % 5 === 0, concat(lit("$"), decStr))
          .when(col("o_orderkey") % 5 === 1, regexp_replace(decStr, "\\.", ","))
          .when(col("o_orderkey") % 5 === 2, concat(lit("USD 1."), decStr))
          .when(col("o_orderkey") % 5 === 3, lit(""))
          .otherwise(lit("precio a consultar"))
        val curRaw = when(col("o_orderkey") % 3 === 0, lit("usd"))
          .when(col("o_orderkey") % 3 === 1, lit("CRC"))
          .otherwise(lit(null).cast(StringType))
        // staged cleaner: the Column-combinator form inlines the dirty
        // when-chain into every reference (~30 regex runs per row)
        CleanFns.cleanPriceStaged(
            o.select(col("o_orderkey"), col("o_totalprice")),
            dirty, curRaw, "price", "currency")
          .select(col("o_orderkey"), col("price"), col("currency"),
            CleanFns.cleanSmallint(
              concat(lit("beds: "), (col("o_orderkey") % 40).cast(StringType)), 30)
              .as("beds"))
          .orderBy(col("o_orderkey"))
      },
      Some("""WITH dirty AS (
             |  SELECT o_orderkey,
             |    CASE WHEN o_orderkey % 5 = 0 THEN '$' || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)
             |         WHEN o_orderkey % 5 = 1 THEN replace(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), '.', ',')
             |         WHEN o_orderkey % 5 = 2 THEN 'USD 1.' || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)
             |         WHEN o_orderkey % 5 = 3 THEN ''
             |         ELSE 'precio a consultar' END AS raw,
             |    CASE WHEN o_orderkey % 3 = 0 THEN 'usd'
             |         WHEN o_orderkey % 3 = 1 THEN 'CRC'
             |         ELSE NULL END AS cur_raw
             |  FROM orders),
             |rep AS (
             |  SELECT o_orderkey, raw, cur_raw,
             |    regexp_replace(replace(trim(raw), ',', '.'), '[^0-9.]', '', 'g') AS stripped
             |  FROM dirty),
             |fix AS (
             |  SELECT *, CASE WHEN len(string_split(stripped, '.')) > 2
             |    THEN array_to_string(string_split(stripped, '.')[1:len(string_split(stripped,'.'))-1], '')
             |         || '.' || string_split(stripped, '.')[-1]
             |    ELSE stripped END AS repaired
             |  FROM rep),
             |num AS (
             |  SELECT *, CASE WHEN regexp_matches(repaired, '^([0-9]+\.?[0-9]*|\.[0-9]+)$')
             |    THEN TRY_CAST(repaired AS DOUBLE) ELSE NULL END AS n
             |  FROM fix)
             |SELECT o_orderkey,
             |  CASE WHEN raw IS NULL OR raw = '' THEN 0.0
             |       WHEN n IS NULL THEN 0.0
             |       WHEN n > 9999999999999.99 THEN 0.0
             |       ELSE n END AS price,
             |  CASE WHEN raw IS NULL OR raw = '' THEN cur_raw
             |       WHEN n IS NULL THEN 'USD'
             |       WHEN n > 9999999999999.99 THEN 'USD'
             |       WHEN n > 1000000 THEN 'CRC'
             |       WHEN cur_raw IS NULL THEN 'USD'
             |       WHEN upper(trim(cur_raw))[1:3] IN ('USD','CRC') THEN upper(trim(cur_raw))[1:3]
             |       ELSE 'USD' END AS currency,
             |  CASE WHEN length(regexp_extract('beds: ' || CAST(o_orderkey % 40 AS VARCHAR), '(\d+)', 1)) BETWEEN 1 AND 18
             |        AND TRY_CAST(regexp_extract('beds: ' || CAST(o_orderkey % 40 AS VARCHAR), '(\d+)', 1) AS BIGINT) <= 30
             |    THEN TRY_CAST(regexp_extract('beds: ' || CAST(o_orderkey % 40 AS VARCHAR), '(\d+)', 1) AS BIGINT)
             |    ELSE NULL END AS beds
             |FROM num ORDER BY o_orderkey""".stripMargin))
  )
}
