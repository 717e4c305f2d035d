package graft

import graft.functions._
import graft.util.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.ColumnBridge

/** SQL-surface registration (SURVEY §7.1 module 8): every custom
  * scalar the engine adds is also callable from Spark SQL text, and
  * the test tables register as temp views — so `spark.sql("SELECT
  * normalize_text(name) ...")` covers the same surface as the
  * DataFrame API.
  */
object GraftFunctions {

  /** Register graft's custom scalar functions into the session's
    * function registry. Native Catalyst expressions go in directly
    * (stay codegen'd in SQL text too); composed-Column combinators get
    * Scala-UDF shims for SQL access — the DataFrame API versions in
    * graft.functions remain the codegen'd hot path. */
  def registerAll(spark: SparkSession): Unit = {
    ColumnBridge.registerFunction(spark, "normalize_text",
      exprs => NormalizeTextExpr(exprs.head))
    ColumnBridge.registerFunction(spark, "difflib_ratio",
      exprs => DifflibRatioExpr(exprs(0), exprs(1)))
    ColumnBridge.registerFunction(spark, "dot_scaled",
      exprs => DotScaledExpr(exprs(0), exprs(1)))
    ColumnBridge.registerFunction(spark, "sorted_intersect_count",
      exprs => SortedIntersectCountExpr(exprs(0), exprs(1)))
    ColumnBridge.registerFunction(spark, "shingle_hashes",
      exprs => ShingleHashesExpr(exprs(0), exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Number,
            org.apache.spark.sql.types.IntegerType |
            org.apache.spark.sql.types.LongType |
            org.apache.spark.sql.types.ShortType |
            org.apache.spark.sql.types.ByteType) => v.intValue()
        case other => throw new IllegalArgumentException(
          s"shingle_hashes(text, n): n must be an integer literal, got $other")
      }))
    spark.udf.register("haversine_km",
      (lat1: Double, lon1: Double, lat2: Double, lon2: Double) => {
        // same formula as GeoFns.haversineKm (cl_test1.py:29-35)
        val sdlat = math.sin(math.toRadians(lat2 - lat1) / 2)
        val sdlon = math.sin(math.toRadians(lon2 - lon1) / 2)
        val a = sdlat * sdlat +
          math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) * (sdlon * sdlon)
        GeoFns.EarthRadiusKm * 2 * math.atan2(math.sqrt(a), math.sqrt(1 - a))
      })
    spark.udf.register("cosine_sim", (a: Seq[Float], b: Seq[Float]) => {
      // same scaled-long encoding as VectorFns.cosine; HALF_UP
      // away-from-zero like Spark's round() (math.round rounds toward
      // +inf for negative halves — not the same)
      def r(x: Double): Long =
        (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong
      var dot = 0L; var na = 0L; var nb = 0L; var i = 0
      while (i < a.length) {
        dot += r(a(i).toDouble * b(i).toDouble * 1e10)
        na += r(a(i).toDouble * a(i).toDouble * 1e10)
        nb += r(b(i).toDouble * b(i).toDouble * 1e10)
        i += 1
      }
      if (na == 0L || nb == 0L) null.asInstanceOf[java.lang.Double]
      else java.lang.Double.valueOf(dot.toDouble / math.sqrt(na.toDouble * nb.toDouble))
    })
    // perceptual image hash (ImageDedup.dhash — the q189/q190 kernel):
    // an image codec can't be a codegen expression, so the SQL face is
    // a UDF over the same function the DataFrame path runs
    spark.udf.register("image_dhash",
      (b: Array[Byte]) => graft.operators.ImageDedup.dhash(b)
        .map(java.lang.Long.valueOf).orNull)
    // PII scrub (TextFns.redactPii composition) for SQL text; the
    // DataFrame path stays the codegen'd regexp_replace chain
    spark.udf.register("redact_pii", (s: String) =>
      if (s == null) null
      else s.replaceAll(TextFns.EmailRe, "<EMAIL>")
        .replaceAll(TextFns.Ipv4Re, "<IP>")
        .replaceAll(TextFns.PhoneRe, "<PHONE>"))
  }

  /** Register the driver test tables as temp views for SQL access
    * (events gets the ns→µs conversion, see EventQueries.events). */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    Tables.names.foreach {
      case "events" =>
        graft.queries.EventQueries.events(spark, sfDir)
          .createOrReplaceTempView("events")
      case n =>
        Tables(spark, sfDir, n).createOrReplaceTempView(n)
    }
}
