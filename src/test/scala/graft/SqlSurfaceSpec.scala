package graft

/** Spark SQL text covers the same surface: custom functions registered
  * in the FunctionRegistry + test tables as views. */
class SqlSurfaceSpec extends SparkSpec {

  test("custom scalar functions are callable from SQL text") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT normalize_text('Cañón JOSÉ') AS n,
        |  difflib_ratio('Brand-13', 'Brand#13') AS r,
        |  round(haversine_km(9.9281, -84.0907, 10.0162, -84.2117), 1) AS d,
        |  cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c,
        |  dot_scaled(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS ds,
        |  shingle_hashes('a b c d', 3) AS sh
        |""".stripMargin).head()
    assert(r.getString(0) == "canon jose")
    assert(r.getDouble(1) == 0.875)
    assert(r.getDouble(2) == 16.5)
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-9)
    assert(r.getLong(4) == 110000000000L) // (1*3 + 2*4) * 1e10
    assert(r.getSeq[Long](5).length == 2) // "a b c", "b c d"
  }

  test("image_dhash and redact_pii are callable from SQL text") {
    GraftFunctions.registerAll(spark)
    spark.read
      .parquet(graft.util.RepoRoot.fixture("image_assets.parquet"))
      .createOrReplaceTempView("image_assets")
    val r = spark.sql(
      """SELECT image_dhash(content) AS dh,
        |  redact_pii('mail a@b.co from 1.2.3.4') AS red
        |FROM image_assets WHERE asset_id = 1""".stripMargin).head()
    val expected = spark.read
      .parquet(graft.util.RepoRoot.fixture("image_dhash_expected.parquet"))
      .where("asset_id = 1").head().getLong(1)
    assert(r.getLong(0) == expected)
    assert(r.getString(1) == "mail <EMAIL> from <IP>")
    // undecodable payload -> NULL through the SQL face too
    assert(spark.sql(
      "SELECT image_dhash(content) FROM image_assets WHERE asset_id = 12")
      .head().isNullAt(0))
  }

  test("a full SQL query over registered views matches the DataFrame API") {
    GraftFunctions.registerAll(spark)
    GraftFunctions.registerViews(spark, sf001)
    val viaSql = spark.sql(
      """SELECT l_returnflag, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      .collect().toSeq
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val viaDf = graft.util.Tables(spark, sf001, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType).as("s"))
      .orderBy(col("l_returnflag")).collect().toSeq
    assert(viaSql == viaDf)
  }
}
