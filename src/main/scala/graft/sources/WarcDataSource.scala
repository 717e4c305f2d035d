package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, ReadMaxFiles}
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
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val maxFiles = Option(options.get("maxFilesPerTrigger")).map(_.toInt)
    new ScanBuilder {
      override def build(): Scan = new WarcScan(path, maxFiles)
    }
  }
}

final case class WarcInputPartition(ranges: Seq[Warc.RecordRange])
    extends InputPartition

class WarcScan(path: String, maxFilesPerTrigger: Option[Int] = None)
    extends Scan with Batch {
  override def readSchema(): StructType = WarcTable.schema
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): streaming.MicroBatchStream =
    new WarcMicroBatchStream(path, maxFilesPerTrigger)
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
      // ranges open one at a time; the CURRENT one is held so close()
      // releases its file handle on error / task kill / early LIMIT
      // stop — the iterator only closes itself on clean EOF
      private val rangeIt = ranges.iterator
      private var open: Warc.OpenRange = _
      private var current: InternalRow = _
      override def next(): Boolean = {
        while (open == null || !open.records.hasNext) {
          if (open != null) open.close()
          if (!rangeIt.hasNext) { open = null; return false }
          open = Warc.openRange(conf, rangeIt.next())
        }
        current = WarcReaderFactory.toRow(open.records.next())
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = if (open != null) open.close()
    }
  }
}

/** Micro-batch streaming read of a WARC landing directory — the
  * "crawl results keep arriving" ingest shape, from the SAME native
  * source the batch scan uses (one decoder, two read modes). The
  * offset is the NAME of the last fully-processed file: each batch
  * admits files strictly greater by name, so a restarted query
  * resumes from the checkpointed offset and replays nothing —
  * file-granularity exactly-once, the file-source contract rebuilt
  * on a custom source. Name-keyed (not positional) offsets make the
  * contract robust to listing churn: a late-arriving file that sorts
  * BEFORE the committed name can never shift other files' identity
  * or cause replays — it is simply never admitted (crawlers name
  * files monotonically — CommonCrawl segments do exactly this — so
  * that case is a misconfigured producer, and the skip is the benign
  * failure mode). Admission control honours `maxFilesPerTrigger`
  * (ReadMaxFiles), and Trigger.AvailableNow snapshots the listing
  * once so a drain terminates even while new files land. */
class WarcMicroBatchStream(path: String, maxFilesPerTrigger: Option[Int])
    extends streaming.MicroBatchStream
    with streaming.SupportsAdmissionControl
    with streaming.SupportsTriggerAvailableNow {

  private def spark = SparkSession.active
  @volatile private var availableNowSnapshot: Option[Seq[String]] = None
  // Listing captured at admission time (latestOffset): batch membership
  // is pinned when the offset is chosen, so a file landing mid-trigger
  // with a name inside the admitted range can neither sneak into the
  // in-flight batch (breaking the maxFilesPerTrigger bound and making a
  // WAL replay differ from the committed batch) nor be skipped — it is
  // admitted by the NEXT trigger's fresh listing.
  @volatile private var admissionSnapshot: Seq[String] = Nil
  private def names: Seq[String] = availableNowSnapshot.getOrElse(
    Warc.listFiles(spark, path).map(_._1)) // sorted by name

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowSnapshot = Some(Warc.listFiles(spark, path).map(_._1))

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(n => ReadLimit.maxFiles(n))
      .getOrElse(ReadLimit.allAvailable())

  /** "" sorts strictly before every file name. */
  override def initialOffset(): streaming.Offset = WarcOffset("")

  override def latestOffset(): streaming.Offset = {
    val listing = names
    admissionSnapshot = listing
    WarcOffset(listing.lastOption.getOrElse(""))
  }

  override def latestOffset(start: streaming.Offset,
                            limit: ReadLimit): streaming.Offset = {
    val from = start.asInstanceOf[WarcOffset].last
    val prev = admissionSnapshot.toSet
    val listing = names
    // observability for the benign-skip contract: a file whose name
    // sorts <= the committed offset but was NOT in the listing when
    // that offset was chosen landed mid-trigger from a non-monotone
    // producer — it can never be admitted (names only move forward),
    // so make the silent skip loud (round-10 advisor finding)
    if (prev.nonEmpty) {
      val lateSkipped = listing.filter(n => n <= from && !prev(n))
      if (lateSkipped.nonEmpty)
        org.apache.log4j.LogManager.getLogger("graft.sources.WarcDataSource")
          .warn(s"${lateSkipped.size} WARC file(s) appeared with names <= " +
            s"the committed offset '$from' and will never be admitted " +
            s"(non-monotone producer): ${lateSkipped.take(3).mkString(", ")}")
    }
    admissionSnapshot = listing
    val pending = listing.filter(_ > from)
    val admitted = limit match {
      case m: ReadMaxFiles => pending.take(m.maxFiles())
      case _ => pending
    }
    WarcOffset(admitted.lastOption.getOrElse(from))
  }

  override def reportLatestOffset(): streaming.Offset =
    WarcOffset(names.lastOption.getOrElse(""))

  override def planInputPartitions(start: streaming.Offset,
                                   end: streaming.Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[WarcOffset].last
    val to = end.asInstanceOf[WarcOffset].last
    // Plan from the listing snapshotted at admission time, so batch
    // membership is exactly what latestOffset admitted. A fresh stream
    // instance replaying a WAL batch (restart) has no snapshot covering
    // `to` and falls back to a live listing filtered by the committed
    // name range — the closest reconstruction a name-keyed offset
    // permits.
    val snapshot = admissionSnapshot
    val base = if (to.isEmpty || snapshot.contains(to)) snapshot else names
    val files = base.filter(n => n > from && n <= to)
    // one partition per file: record ranges within a batch's files
    // still decode in parallel across the batch
    files.map(f =>
      WarcInputPartition(Warc.recordIndex(spark, f)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val confEntries = {
      import scala.jdk.CollectionConverters._
      spark.sparkContext.hadoopConfiguration.iterator().asScala
        .map(e => e.getKey -> e.getValue).toArray
    }
    new WarcReaderFactory(confEntries)
  }

  override def deserializeOffset(json: String): streaming.Offset =
    WarcOffset.fromJson(json)
  override def commit(end: streaming.Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Name of the last fully-processed file ("" before any). */
final case class WarcOffset(last: String) extends streaming.Offset {
  override def json(): String =
    "{\"last\":\"" + last.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\"}"
}

object WarcOffset {
  def fromJson(json: String): WarcOffset = {
    val t = json.trim
    require(t.startsWith("{\"last\":\"") && t.endsWith("\"}"),
      s"malformed warc offset: $t")
    val body = t.substring(9, t.length - 2)
    val sb = new StringBuilder
    var i = 0
    while (i < body.length) {
      body.charAt(i) match {
        case '\\' =>
          require(i + 1 < body.length, s"malformed warc offset: $t")
          body.charAt(i + 1) match {
            case 'u' =>
              require(i + 6 <= body.length, s"malformed warc offset: $t")
              sb.append(Integer.parseInt(body.substring(i + 2, i + 6), 16).toChar)
              i += 6
            case c => sb.append(c); i += 2
          }
        case c => sb.append(c); i += 1
      }
    }
    WarcOffset(sb.toString)
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
