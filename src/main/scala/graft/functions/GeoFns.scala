package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Geospatial column combinators: haversine distance and grid-cell
  * bucketing. The reference delegates spatial predicates to PostGIS
  * GiST indexes (reference: src/ETL_POIS/cl_test1.py:69-99); on Spark
  * the equivalent access path is a grid-cell equi-join prefilter plus
  * an exact haversine post-filter (SURVEY §4) — see
  * [[graft.operators.GeoRadiusJoin]].
  */
object GeoFns {
  val EarthRadiusKm = 6371.0
  /** Kilometres per degree of latitude (and of longitude at the equator). */
  val KmPerDegLat = 111.32

  /** Great-circle distance in km, atan2 formulation — exactly the
    * reference's haversine (reference: src/ETL_POIS/cl_test1.py:29-35).
    * Pure built-in trig ⇒ whole-stage codegen. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    // squares via multiplication, not pow(): x*x is IEEE exact-rounded
    // and therefore bit-identical across engines, pow() is not.
    val sdlat = sin(radians(lat2 - lat1) / 2)
    val sdlon = sin(radians(lon2 - lon1) / 2)
    val a = sdlat * sdlat +
      cos(radians(lat1)) * cos(radians(lat2)) * (sdlon * sdlon)
    val c = atan2(sqrt(a), sqrt(lit(1d) - a)) * 2
    lit(EarthRadiusKm) * c
  }

  /** Integer grid-cell coordinates for a given cell size in degrees.
    * Encoded as a single long (latCell * 2^20 + lonCell offset-shifted)
    * so the join key is one fixed-width column. */
  def cellLat(lat: Column, cellDeg: Double): Column =
    floor(lat / cellDeg).cast(LongType)
  def cellLon(lon: Column, cellDeg: Double): Column =
    floor(lon / cellDeg).cast(LongType)
  def cellId(latCell: Column, lonCell: Column): Column =
    (latCell + 1024L) * 1048576L + (lonCell + 524288L)

  /** Deterministic synthetic coordinates derived from an integer key —
    * used to exercise geo operators on the TPC-H-ish test tables (which
    * carry no coordinates). Keys spread over Costa-Rica-ish extents so
    * radii behave like the reference's 3-15 km tiers. Must stay exactly
    * expressible in the DuckDB oracle: only +,*,% on integers. */
  def synthLat(key: Column): Column =
    (lit(9.6d) + (key % 1000L).cast(DoubleType) * lit(0.0008d))
  def synthLon(key: Column): Column =
    (lit(-84.3d) + ((key * 7L) % 1000L).cast(DoubleType) * lit(0.0008d))
}
