package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Uniform access to the driver-generated test tables (TESTDATA.md).
  *
  * All schemas are fixed and known (FIXTURES.md §B) — at 100 TB we never
  * schema-infer; parquet footers carry the schema and Catalyst prunes
  * columns/pushes predicates into the scan automatically.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Session tuned for the graft engine. local[32] here; on a real
    * cluster the same knobs come from spark-submit. AQE handles runtime
    * re-planning (adaptive shuffle partition coalescing, broadcast
    * conversion, skew-join splitting) — essential at 100 TB.
    */
  def session(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
}
