package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 face of [[Warc]]: `spark.read.format("warc")
  * .load(path)`. Planning distributes per-record ranges (raw files)
  * and whole files (gzip) through the connector API — same structure
  * as [[OsmPbfDataSource]]; registered under the `warc` short name
  * via META-INF/services. */
class WarcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new WarcTable(Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("warc requires a path, e.g. .load(path)")))
}

object WarcTable {
  val schema: StructType = StructType(Seq(
    StructField("src_file", StringType, nullable = false),
    StructField("record_index", LongType, nullable = false),
    StructField("warc_type", StringType, nullable = false),
    StructField("record_id", StringType, nullable = false),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))
}

class WarcTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"warc:$path"
  override def schema(): StructType = WarcTable.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder { override def build(): Scan = new WarcScan(path) }
}

final case class WarcInputPartition(ranges: Seq[Warc.RecordRange])
    extends InputPartition

class WarcScan(path: String) extends Scan with Batch {
  override def readSchema(): StructType = WarcTable.schema
  override def toBatch: Batch = this
  override def description(): String = s"WarcScan($path)"

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val ranges = Warc.recordIndex(spark, path)
    val slices = math.min(math.max(1, ranges.size),
      spark.sparkContext.defaultParallelism)
    // round-robin by range: consecutive records of a raw file spread
    // across tasks; each gzip file is one indivisible range
    ranges.zipWithIndex.groupBy(_._2 % slices).values
      .map(g => WarcInputPartition(g.map(_._1)))
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val confEntries = {
      import scala.jdk.CollectionConverters._
      SparkSession.active.sparkContext.hadoopConfiguration.iterator().asScala
        .map(e => e.getKey -> e.getValue).toArray
    }
    new WarcReaderFactory(confEntries)
  }
}

class WarcReaderFactory(confEntries: Array[(String, String)])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    confEntries.foreach { case (k, v) => conf.set(k, v) }
    val ranges = partition.asInstanceOf[WarcInputPartition].ranges
    new PartitionReader[InternalRow] {
      private val it = ranges.iterator.flatMap(r => Warc.decodeRecords(conf, r))
      private var current: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { current = WarcReaderFactory.toRow(it.next()); true }
        else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

object WarcReaderFactory {
  def toRow(r: Warc.WarcRecord): InternalRow =
    InternalRow(
      UTF8String.fromString(r.srcFile),
      r.recordIndex,
      UTF8String.fromString(r.warcType),
      UTF8String.fromString(r.recordId),
      r.targetUri.map(UTF8String.fromString).orNull,
      r.warcDate.map(UTF8String.fromString).orNull,
      r.contentType.map(UTF8String.fromString).orNull,
      r.contentLength,
      r.payload)
}
