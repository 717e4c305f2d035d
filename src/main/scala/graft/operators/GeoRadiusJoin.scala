package graft.operators

import graft.functions.GeoFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed spatial radius join (the reference's `ST_DWithin`
  * PostGIS query, reference: src/ETL_POIS/cl_test1.py:66-218), as a
  * grid-cell equi-join prefilter + exact haversine post-filter.
  *
  * Plan shape (scale rationale):
  *  1. Both sides get an integer grid-cell id with cell size ≥ the
  *     search radius in degrees. The LEFT side explodes to its 3×3(+)
  *     cell neighborhood, so every true pair shares ≥1 cell key —
  *     no candidate is missed at cell boundaries (SURVEY §7.4 risk).
  *  2. Equi-join on the cell id — a plain shuffle/broadcast hash join
  *     Catalyst can optimize (AQE will broadcast a small POI side).
  *  3. Exact `haversineKm ≤ radius` post-filter.
  *
  * The neighborhood factor in longitude grows with |lat| (meridian
  * convergence); `maxAbsLat` bounds it. Cost: |L|·(3·(2·nLon+1))
  * exploded rows — constant factor, fully parallel, no cross join.
  */
object GeoRadiusJoin {

  /** @param left  rows with (leftLat, leftLon) columns
    * @param right rows with (rightLat, rightLon) columns
    * @return left ⋈ right pairs within radiusKm, plus a `dist_km` column */
  def apply(left: DataFrame, right: DataFrame,
            leftLat: String, leftLon: String,
            rightLat: String, rightLon: String,
            radiusKm: Double, maxAbsLat: Double = 60.0): DataFrame = {
    val cellDeg = radiusKm / GeoFns.KmPerDegLat
    val nLon = math.ceil(1.0 / math.cos(math.toRadians(maxAbsLat))).toInt
    val latOffsets = (-1 to 1).map(i => lit(i))
    val lonOffsets = (-nLon to nLon).map(i => lit(i))

    val l = left
      .withColumn("_lat_cell", GeoFns.cellLat(col(leftLat), cellDeg))
      .withColumn("_lon_cell", GeoFns.cellLon(col(leftLon), cellDeg))
      .withColumn("_dlat", explode(array(latOffsets: _*)))
      .withColumn("_dlon", explode(array(lonOffsets: _*)))
      .withColumn("_cell",
        GeoFns.cellId(col("_lat_cell") + col("_dlat"), col("_lon_cell") + col("_dlon")))
      .drop("_lat_cell", "_lon_cell", "_dlat", "_dlon")

    val r = right
      .withColumn("_cell",
        GeoFns.cellId(GeoFns.cellLat(col(rightLat), cellDeg),
          GeoFns.cellLon(col(rightLon), cellDeg)))

    l.join(r, "_cell")
      .withColumn("dist_km",
        GeoFns.haversineKm(col(leftLat), col(leftLon), col(rightLat), col(rightLon)))
      .filter(col("dist_km") <= radiusKm)
      .drop("_cell")
  }
}
