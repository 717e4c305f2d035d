package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-cleaning column combinators (pure `Column` expressions — fully
  * codegen'd by Catalyst, no UDFs in the hot path).
  *
  * Semantics re-expressed from the reference ETL's row-at-a-time Python
  * cleaners (reference: src/ETL_PROPERTIES/loader_v2.py:16-70):
  *  - `cleanPrice`   — loader_v2.py:16-39 (multi-dot repair, 1e13 cap,
  *                     currency whitelist USD/CRC, >1e6 ⇒ CRC heuristic;
  *                     the cap check deliberately precedes the heuristic —
  *                     order-sensitive, see SURVEY §7.4)
  *  - `cleanArea`    — loader_v2.py:41-50 ((0, 9999999.99] bounds)
  *  - `cleanSmallint`— loader_v2.py:52-60 (first integer group, ≤ limit)
  *  - `cleanNumericSmall` — loader_v2.py:62-70 (float ≤ 99.9)
  *  - `titleTypeClassifier` — loader_v2.py:181-185
  *  - `truncTitle`   — loader_v2.py:131
  */
object CleanFns {

  /** Digits-and-dots extraction with comma→dot, as in the reference's
    * `re.sub(r'[^0-9.]','', s.replace(',', '.'))`. */
  private def strippedNumeric(s: Column): Column =
    regexp_replace(regexp_replace(trim(s), ",", "."), "[^0-9.]", "")

  /** Multi-dot repair: "1.234.56" → "1234.56" — drop every dot that has
    * another dot after it (one lookahead regex pass; the input is
    * digits-and-dots only, so "later dot" ⇔ "not the decimal point").
    * One regex replaces the former split/slice/array_join/element_at
    * 5-op tree, which re-computed `stripped` once per reference. */
  private[functions] def repairedNumeric(s: Column): Column =
    regexp_replace(strippedNumeric(s), "\\.(?=.*\\.)", "")

  /** Python's `not val` over string inputs: None or "" (whitespace-only
    * strings are truthy in Python and fall through to the parse). */
  private def isEmptyVal(v: Column): Column = v.isNull || v === ""

  /** Python float()-parse equivalence, safe under ANSI mode: only
    * strings float() accepts ("123", "123.", ".5", "1.25") are cast;
    * anything else ("", ".", junk) yields NULL instead of an error. */
  private def parsedDouble(s: Column): Column =
    when(s.rlike("^([0-9]+\\.?[0-9]*|\\.[0-9]+)$"), s.cast(DoubleType))
      .otherwise(lit(null).cast(DoubleType))

  /** Returns struct(price DOUBLE, currency STRING).
    * Mirrors clean_price(val, currency_raw): empty → (0, raw currency);
    * unparseable or > 9999999999999.99 → (0,'USD'); currency whitelist
    * {USD, CRC} else USD; value > 1e6 forces CRC. */
  def cleanPrice(value: Column, currencyRaw: Column): Column = {
    val num = parsedDouble(repairedNumeric(value))
    val curBase = substring(upper(trim(currencyRaw)), 1, 3)
    val curValid =
      when(currencyRaw.isNull || !curBase.isin("USD", "CRC"), lit("USD"))
        .otherwise(curBase)
    val price =
      when(isEmptyVal(value), lit(0d))
        .when(num.isNull, lit(0d))
        .when(num > lit(9999999999999.99d), lit(0d))
        .otherwise(num)
    val currency =
      when(isEmptyVal(value), currencyRaw)
        .when(num.isNull, lit("USD"))
        .when(num > lit(9999999999999.99d), lit("USD"))
        .when(num > lit(1000000d), lit("CRC"))
        .otherwise(curValid)
    struct(price.as("price"), currency.as("currency"))
  }

  /** Staged clean_price: appends `priceCol`/`currencyCol` to `df`,
    * computing each heavy intermediate (the raw value, the
    * stripped+repaired numeric, the parsed double) EXACTLY once per
    * row. The [[cleanPrice]] Column combinator references its `value`
    * argument ~5× and the parsed number ~6×; Catalyst inlines every
    * reference, so a regex-bearing `value` expression re-runs its
    * whole chain ~30× per row (q13 spent 10.2 s at sf0.1 on exactly
    * this — hidden until round 8's Bench stopped letting count()
    * prune the clean columns). Multi-referenced non-cheap aliases
    * block CollapseProject, so these stages survive optimization. */
  def cleanPriceStaged(df: org.apache.spark.sql.DataFrame, value: Column,
                       currencyRaw: Column, priceCol: String,
                       currencyCol: String): org.apache.spark.sql.DataFrame = {
    val rawC = "__cp_raw"; val repC = "__cp_rep"; val numC = "__cp_num"
    val out = df
      .withColumn(rawC, value)
      .withColumn(repC, repairedNumeric(col(rawC)))
      .withColumn(numC, parsedDouble(col(repC)))
      .withColumn(priceCol,
        when(isEmptyVal(col(rawC)), lit(0d))
          .when(col(numC).isNull, lit(0d))
          .when(col(numC) > lit(9999999999999.99d), lit(0d))
          .otherwise(col(numC)))
      .withColumn(currencyCol, {
        val curBase = substring(upper(trim(currencyRaw)), 1, 3)
        val curValid =
          when(currencyRaw.isNull || !curBase.isin("USD", "CRC"), lit("USD"))
            .otherwise(curBase)
        when(isEmptyVal(col(rawC)), currencyRaw)
          .when(col(numC).isNull, lit("USD"))
          .when(col(numC) > lit(9999999999999.99d), lit("USD"))
          .when(col(numC) > lit(1000000d), lit("CRC"))
          .otherwise(curValid)
      })
    out.drop(rawC, repC, numC)
  }

  /** Numeric area in (0, 9999999.99], else NULL. No multi-dot repair —
    * the reference's clean_area lets float() fail on "1.2.3". */
  def cleanArea(value: Column): Column = {
    val num = parsedDouble(strippedNumeric(value))
    when(isEmptyVal(value), lit(null).cast(DoubleType))
      .when(num.isNull || num <= lit(0d) || num > lit(9999999.99d),
        lit(null).cast(DoubleType))
      .otherwise(num)
  }

  /** First integer group in the string, NULL when absent or > maxLimit. */
  def cleanSmallint(value: Column, maxLimit: Long = 30000L): Column = {
    val grp = regexp_extract(value.cast(StringType), "(\\d+)", 1)
    // length gate keeps the ANSI-mode cast from overflowing Long on
    // absurd digit runs (Python's bigint just compares > limit → None).
    val num = when(length(grp).between(1, 18), grp.cast(LongType))
      .otherwise(lit(null).cast(LongType))
    when(isEmptyVal(value), lit(null).cast(LongType))
      .when(num.isNull || num > lit(maxLimit), lit(null).cast(LongType))
      .otherwise(num)
  }

  /** Small numeric (e.g. bathrooms) ≤ maxLimit, else NULL. */
  def cleanNumericSmall(value: Column, maxLimit: Double = 99.9): Column = {
    val num = parsedDouble(strippedNumeric(value))
    when(isEmptyVal(value), lit(null).cast(DoubleType))
      .when(num.isNull || num > lit(maxLimit), lit(null).cast(DoubleType))
      .otherwise(num)
  }

  /** Title-keyword property-type classifier: 'lote' ⇒ 3, 'apartamento'
    * ⇒ 2, else 1 (reference: loader_v2.py:181-185). */
  def titleTypeClassifier(title: Column): Column =
    when(lower(title).contains("lote"), lit(3))
      .when(lower(title).contains("apartamento"), lit(2))
      .otherwise(lit(1))

  /** Truncation projections (title[:250] etc.). */
  def truncTitle(title: Column, n: Int = 250): Column = substring(title, 1, n)
}
