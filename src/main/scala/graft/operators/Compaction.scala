package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Small-file compaction — the table-maintenance twin of the GC
  * reconcile (reference: disk/DB orphan sweep,
  * src/ETL_IMAGES/image_garbage_collector.py:46-122). Continuous
  * micro-batch ingest (foreachBatch sinks, per-batch MERGE output)
  * accretes thousands of KB-sized parquet files; at 100 TB the
  * resulting file-listing and task-scheduling overhead dominates scan
  * cost, so periodic bin-packing to a target file size is part of the
  * engine surface, not an ops afterthought.
  *
  * Rewrites `inDir` as ceil(totalBytes / targetBytes) files. With
  * `sortCol` the rewrite is range-clustered (repartitionByRange +
  * local sort), so parquet row-group min/max stats become selective
  * and later range predicates skip whole files; without it, a plain
  * round-robin repartition balances file sizes exactly.
  */
object Compaction {

  case class Result(inputFiles: Int, outputFiles: Int, totalBytes: Long)

  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long, sortCol: Option[String] = None): Result = {
    require(new Path(inDir) != new Path(outDir),
      s"compaction cannot overwrite its own input ($inDir)")
    val fs = new Path(inDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // recursive: partitioned layouts keep their data files under
    // key=value subdirectories — a top-level listing would see only
    // directories, compute totalBytes = 0, and pack everything into
    // one file
    val it = fs.listFiles(new Path(inDir), true)
    val parts = Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next())
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .toArray
    val totalBytes = parts.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(inDir)
    val packed: DataFrame = sortCol match {
      case Some(c) => df.repartitionByRange(nOut, col(c)).sortWithinPartitions(col(c))
      case None    => df.repartition(nOut)
    }
    packed.write.mode("overwrite").parquet(outDir)
    Result(parts.length, nOut, totalBytes)
  }
}
