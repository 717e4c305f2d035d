package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Content-hash functions for change detection / idempotent merge.
  *
  * Re-expressed from the reference:
  *  - `contentHash` — SHA-256 over title|price|currency|sqm|lat|lng|
  *    sorted-features-JSON (reference: src/ETL_PROPERTIES/loader_v2.py:84-88)
  *  - `poiHash`     — SHA-256 of category|lat:.6f|lon:.6f, name excluded
  *    for stability (reference: src/ETL_POIS/cl_test1.py:152-157 /
  *    process_pois.py:151-157)
  *  - `docHash`     — SHA-256 of body text (reference:
  *    src/shared/vector_store.py:70-72)
  *
  * All are pure built-in expressions (`sha2`, `concat_ws`,
  * `format_string`) — codegen'd, no UDFs, safe at any scale.
  */
object HashFns {

  /** Python-style `json.dumps(m, sort_keys=True)` for a
    * MAP<STRING,STRING> column: `{"a": "1", "b": "2"}` (note the
    * `": "` / `", "` separators). Assumes keys/values free of
    * `"`/`\` (true for the reference's feature maps); full JSON
    * escaping would need a custom Expression. */
  def pyJsonSortedMap(m: Column): Column = {
    val ks = array_sort(map_keys(m))
    val entries = transform(ks, k =>
      concat(lit("\""), k, lit("\": \""), element_at(m, k), lit("\"")))
    when(m.isNull, lit("null"))
      .otherwise(concat(lit("{"), array_join(entries, ", "), lit("}")))
  }

  /** SHA-256 change-detection hash over the canonical property fields.
    * NULL fields render as "None" to mirror Python f-string formatting
    * of missing keys. */
  def contentHash(title: Column, price: Column, currency: Column,
                  sqm: Column, lat: Column, lng: Column,
                  features: Column): Column = {
    def s(c: Column): Column = coalesce(c.cast("string"), lit("None"))
    sha2(concat_ws("|",
      s(title), s(price), s(currency), s(sqm), s(lat), s(lng),
      pyJsonSortedMap(features)), 256)
  }

  /** Stable POI identity hash: category + coords at 6 decimal places
    * (~0.1 m); the name is deliberately excluded. */
  def poiHash(category: Column, lat: Column, lon: Column): Column =
    sha2(concat_ws("|",
      category,
      format_string("%.6f", lat),
      format_string("%.6f", lon)), 256)

  /** SHA-256 of a document body (idempotent re-embed gate). */
  def docHash(body: Column): Column = sha2(body, 256)
}
