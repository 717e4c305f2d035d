package graft.util

import org.apache.spark.sql.functions._

/** Scratch main for environment probes; not part of the engine surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Tables.session("probe")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    println("ansi=" + spark.conf.get("spark.sql.ansi.enabled"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    val ev2 = ev.withColumn("ts_us", expr("timestamp_micros(ts div 1000)"))
    ev2.select(col("ts"), col("ts_us")).orderBy("event_id").show(3, false)
    val d = Seq("123.", ".5", "1.2.3", "", "abc").toDF("s")
    try d.select(col("s"), when(col("s").rlike("^([0-9]+\\.?[0-9]*|\\.[0-9]+)$"),
      col("s").cast("double")).otherwise(lit(null)).as("v")).show()
    catch { case e: Throwable => println("cast fail: " + e.getMessage.take(300)) }
    val doc = Tables(spark, "/root/testdata/sf0.001", "documents")
    doc.select(graft.functions.TextFns.normalizeText(col("text")).substr(1, 20)).show(2)
    doc.select(col("doc_id"), graft.operators.Dedup.md5Int32(col("text")).as("h32")).show(3)
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    emb.select(col("vec_id"), graft.functions.VectorFns.normSqScaled(col("embedding")).as("n2"))
      .orderBy("vec_id").show(3)
    spark.stop()
  }
}
