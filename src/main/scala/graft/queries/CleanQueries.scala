package graft.queries

import graft.functions.{CleanFns, HashFns, TextFns}
import graft.util.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Oracle coverage for the scalar cleaning/hash/normalization functions
  * that were previously unit-test-only (SURVEY §2 F2/F4/F6/F8). Each
  * query synthesizes dirty inputs from the test tables with arithmetic
  * both engines express identically, applies the graft function on the
  * Spark side, and re-states the reference semantics
  * (src/ETL_PROPERTIES/loader_v2.py:41-70, src/ETL_POIS/
  * process_pois.py:151-165) in portable SQL on the DuckDB side.
  */
object CleanQueries {

  val all: Seq[Q] = Seq(

    // F2 clean_area: (0, 9999999.99] bounds, comma→dot, junk → NULL,
    // NO multi-dot repair (float() fails → NULL), empty → NULL.
    Q("q61_clean_area",
      (s, dir) => {
        val k = col("p_partkey")
        val price = col("p_retailprice").cast(StringType)
        val raw = when(k % 6 === 0, concat(price, lit(" m2")))
          .when(k % 6 === 1, lit(""))
          .when(k % 6 === 2, translate(price, ".", ","))
          .when(k % 6 === 3, lit("99999999"))
          .when(k % 6 === 4, lit("1.2.3"))
          .otherwise(lit("N/A"))
        Tables(s, dir, "part").filter(k <= 2000)
          .select(k, raw.as("area_raw"))
          .withColumn("area", CleanFns.cleanArea(col("area_raw")))
          .orderBy(k)
      },
      Some("""WITH src AS (
             |  SELECT p_partkey,
             |    CASE CAST(p_partkey % 6 AS INT)
             |      WHEN 0 THEN CAST(p_retailprice AS VARCHAR) || ' m2'
             |      WHEN 1 THEN ''
             |      WHEN 2 THEN replace(CAST(p_retailprice AS VARCHAR), '.', ',')
             |      WHEN 3 THEN '99999999'
             |      WHEN 4 THEN '1.2.3'
             |      ELSE 'N/A' END AS area_raw
             |  FROM part WHERE p_partkey <= 2000),
             |num AS (
             |  SELECT p_partkey, area_raw,
             |    regexp_replace(replace(trim(area_raw), ',', '.'),
             |                   '[^0-9.]', '', 'g') AS stripped
             |  FROM src),
             |parsed AS (
             |  SELECT p_partkey, area_raw,
             |    CASE WHEN regexp_matches(stripped,
             |        '^([0-9]+\.?[0-9]*|\.[0-9]+)$')
             |      THEN CAST(stripped AS DOUBLE) END AS n
             |  FROM num)
             |SELECT p_partkey, area_raw,
             |  CASE WHEN area_raw IS NULL OR area_raw = '' THEN NULL
             |       WHEN n IS NULL OR n <= 0 OR n > 9999999.99 THEN NULL
             |       ELSE n END AS area
             |FROM parsed ORDER BY p_partkey""".stripMargin)),

    // F4 clean_numeric_small: float ≤ 99.9 else NULL (bathrooms-style).
    Q("q62_clean_numeric_small",
      (s, dir) => {
        val k = col("p_partkey")
        val sz = col("p_size").cast(StringType)
        val raw = when(k % 4 === 0, concat(sz, lit(".5")))
          .when(k % 4 === 1, lit("150.7"))
          .when(k % 4 === 2, lit(""))
          .otherwise(concat(sz, lit(" baths")))
        Tables(s, dir, "part").filter(k <= 2000)
          .select(k, raw.as("baths_raw"))
          .withColumn("baths", CleanFns.cleanNumericSmall(col("baths_raw")))
          .orderBy(k)
      },
      Some("""WITH src AS (
             |  SELECT p_partkey,
             |    CASE CAST(p_partkey % 4 AS INT)
             |      WHEN 0 THEN CAST(p_size AS VARCHAR) || '.5'
             |      WHEN 1 THEN '150.7'
             |      WHEN 2 THEN ''
             |      ELSE CAST(p_size AS VARCHAR) || ' baths' END AS baths_raw
             |  FROM part WHERE p_partkey <= 2000),
             |num AS (
             |  SELECT p_partkey, baths_raw,
             |    regexp_replace(replace(trim(baths_raw), ',', '.'),
             |                   '[^0-9.]', '', 'g') AS stripped
             |  FROM src),
             |parsed AS (
             |  SELECT p_partkey, baths_raw,
             |    CASE WHEN regexp_matches(stripped,
             |        '^([0-9]+\.?[0-9]*|\.[0-9]+)$')
             |      THEN CAST(stripped AS DOUBLE) END AS n
             |  FROM num)
             |SELECT p_partkey, baths_raw,
             |  CASE WHEN baths_raw IS NULL OR baths_raw = '' THEN NULL
             |       WHEN n IS NULL OR n > 99.9 THEN NULL
             |       ELSE n END AS baths
             |FROM parsed ORDER BY p_partkey""".stripMargin)),

    // F6 poi_hash: sha256(category|%.6f|%.6f) — name excluded; synth
    // coordinates are two-decimal grids so 6-dp rendering can't tie.
    Q("q63_poi_hash",
      (s, dir) => {
        val k = col("c_custkey")
        val lat = (k % 17000L).cast(DoubleType) / lit(100d) - lit(85d)
        val lon = (k % 35000L).cast(DoubleType) / lit(100d) - lit(175d)
        Tables(s, dir, "customer").filter(k <= 3000)
          .select(k, col("c_mktsegment").as("category"),
            lat.as("lat"), lon.as("lon"))
          .withColumn("poi_hash",
            HashFns.poiHash(col("category"), col("lat"), col("lon")))
          .orderBy(k)
      },
      Some("""SELECT c_custkey, c_mktsegment AS category,
             |  CAST(c_custkey % 17000 AS DOUBLE) / CAST(100 AS DOUBLE)
             |    - CAST(85 AS DOUBLE) AS lat,
             |  CAST(c_custkey % 35000 AS DOUBLE) / CAST(100 AS DOUBLE)
             |    - CAST(175 AS DOUBLE) AS lon,
             |  sha256(c_mktsegment || '|' ||
             |    printf('%.6f', CAST(c_custkey % 17000 AS DOUBLE)
             |      / CAST(100 AS DOUBLE) - CAST(85 AS DOUBLE)) || '|' ||
             |    printf('%.6f', CAST(c_custkey % 35000 AS DOUBLE)
             |      / CAST(100 AS DOUBLE) - CAST(175 AS DOUBLE))) AS poi_hash
             |FROM customer WHERE c_custkey <= 3000
             |ORDER BY c_custkey""".stripMargin)),

    // F8 normalize_text: NFD diacritic strip + lowercase, checked
    // against DuckDB's strip_accents+lower (accented prefix added —
    // the synthetic docs are pure ASCII).
    Q("q64_normalize_text",
      (s, dir) => graft.util.Tables(s, dir, "documents")
        .select(col("doc_id"),
          TextFns.normalizeText(
            concat(lit("Áéî ÕÜ Ñç àè "), substring(col("text"), 1, 200)))
            .as("norm"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  lower(strip_accents('Áéî ÕÜ Ñç àè ' || substr(text, 1, 200)))
             |    AS norm
             |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
