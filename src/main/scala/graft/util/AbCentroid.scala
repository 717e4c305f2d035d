package graft.util

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Same-window A/B for q156's classify pass (r15 evidence run): the
  * r13 interpreted `zip_with`+`aggregate` distance against the r14
  * codegen `DotLongExpr` norm-expansion form, over the identical
  * centroid table and wide embedding copy, Bench-identical force,
  * warm + two timed sweeps each, per-variant min. The two variants
  * must also agree cell-for-cell on the confusion matrix — asserted
  * here, so the A/B doubles as a parity check.
  * `runMain graft.util.AbCentroid [sfDir]` */
object AbCentroid {
  def main(args: Array[String]): Unit = {
    val spark = Tables.session("ab-centroid")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.enableSessionCache()
    Tables.wide(spark, dir, "embeddings").count()

    import graft.functions.VectorFns
    def q = Tables.wide(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"), expr(
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
        .as("qv"))
    def cent = q
      .select(col("label").as("clabel"), posexplode(col("qv")).as(Seq("i", "v")))
      .groupBy(col("clabel"), col("i"))
      .agg(expr("CAST(sum(CAST(v AS DECIMAL(38,0))) div count(1) AS BIGINT)")
        .as("cv"))
      .groupBy(col("clabel"))
      .agg(expr("transform(array_sort(collect_list(struct(i, cv))), p -> p.cv)")
        .as("carr"))

    def confusion(dist: DataFrame): DataFrame = dist
      .groupBy(col("vec_id"), col("label"))
      .agg(min(struct(col("dist"), col("clabel"))).as("m"))
      .select(col("label"), col("m.clabel").as("pred"))
      .groupBy(col("label"), col("pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("label"), col("pred"))

    // r13 form: interpreted HOF distance per (row, centroid) pair
    def hof = confusion(q.join(broadcast(cent))
      .withColumn("dist", expr(
        "aggregate(zip_with(qv, carr, (a, b) -> (a - b) * (a - b)), 0L, (acc, v) -> acc + v)")))
    // r14 form: codegen dot kernel, norms hoisted above the cross join
    def ker = confusion(q.withColumn("qq", VectorFns.dotLong(col("qv"), col("qv")))
      .join(broadcast(cent.withColumn("cc",
        VectorFns.dotLong(col("carr"), col("carr")))))
      .withColumn("dist", col("qq") -
        lit(2L) * VectorFns.dotLong(col("qv"), col("carr")) + col("cc")))

    val a = hof.collect().map(_.toString).toSeq
    val b = ker.collect().map(_.toString).toSeq
    assert(a == b, s"confusion matrices differ: $a vs $b")
    println(s"parity ok: ${a.size} confusion cells identical")

    def force(df: DataFrame): Unit =
      df.select(df.columns.map(c => count(col(c))).reduce(_ + _)).collect()
    def time(mk: => DataFrame): Double = {
      val t0 = System.nanoTime(); force(mk); (System.nanoTime() - t0) / 1e9
    }
    time(hof); time(ker) // warm
    val (h1, k1) = (time(hof), time(ker))
    val (h2, k2) = (time(hof), time(ker))
    println(f"q156 full      hof(zip_with+aggregate) min=${math.min(h1, h2)}%.3f s  " +
      f"kernel(DotLongExpr) min=${math.min(k1, k2)}%.3f s")

    // isolate the CLASSIFY pass (the part the r14 change touched):
    // centroid table and quantized rows pre-materialized, so the timed
    // region is pairs × distance only
    val centM = cent.localCheckpoint()
    val qM = q.localCheckpoint()
    def hofP = confusion(qM.join(broadcast(centM))
      .withColumn("dist", expr(
        "aggregate(zip_with(qv, carr, (a, b) -> (a - b) * (a - b)), 0L, (acc, v) -> acc + v)")))
    def kerP = confusion(qM.withColumn("qq", VectorFns.dotLong(col("qv"), col("qv")))
      .join(broadcast(centM.withColumn("cc",
        VectorFns.dotLong(col("carr"), col("carr")))))
      .withColumn("dist", col("qq") -
        lit(2L) * VectorFns.dotLong(col("qv"), col("carr")) + col("cc")))
    time(hofP); time(kerP)
    val (hp1, kp1) = (time(hofP), time(kerP))
    val (hp2, kp2) = (time(hofP), time(kerP))
    println(f"q156 classify-only  hof min=${math.min(hp1, hp2)}%.3f s  " +
      f"kernel min=${math.min(kp1, kp2)}%.3f s")
    spark.stop()
  }
}
