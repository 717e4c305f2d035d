package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.functions._

/** Native WARC source (sources/Warc.scala): wire-level parsing against
  * the independently-encoded fixture corpus, split planning, gzip
  * member streaming, and loud failure on truncation. */
class WarcSourceSpec extends SparkSpec {

  private val dir = graft.util.RepoRoot.fixture("tiny_warc")

  test("warc scan distributes raw records and keeps gzip files whole") {
    val ranges = graft.sources.Warc.recordIndex(spark, dir)
    // a.warc: one range per record (4); b.warc.gz: one whole-file range
    val (gz, raw) = ranges.partition(_.gzip)
    assert(raw.size == 4 && gz.size == 1)
    assert(raw.map(_.firstIndex).sorted == Seq(0L, 1L, 2L, 3L))
    assert(gz.head.offset == 0L)
    // raw ranges tile the file exactly: framing (folded headers
    // included) is byte-accurate
    val sorted = raw.sortBy(_.offset)
    sorted.sliding(2).foreach { case Seq(a, b) =>
      assert(a.offset + a.length == b.offset, "ranges must tile with no gap")
    }
    val fileLen = new java.io.File(s"$dir/a.warc").length()
    assert(sorted.last.offset + sorted.last.length == fileLen)
    // the DSv2 plan spreads the 5 ranges over >1 partition
    val scan = new graft.sources.WarcScan(dir)
    assert(scan.planInputPartitions().length > 1)
  }

  test("payload bytes round-trip exactly and gzip members stream in order") {
    val df = spark.read.format("warc").load(dir).cache()
    val resp = df.filter(col("src_file") === "a.warc" && col("record_index") === 0)
      .select(col("payload")).head().getAs[Array[Byte]](0)
    val s = new String(resp, "UTF-8")
    assert(s.startsWith("HTTP/1.1 200 OK\r\n"))
    assert(s.contains("hello warc ✓")) // UTF-8 payload survives
    // the empty-payload record
    val empty = df.filter(col("src_file") === "a.warc" && col("record_index") === 3)
      .select(length(col("payload")), col("content_length")).head()
    assert(empty.getInt(0) == 0 && empty.getLong(1) == 0L)
    // three concatenated gzip members = three records, indexes 0..2
    val gz = df.filter(col("src_file") === "b.warc.gz")
      .select(col("record_index"), col("content_length"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(gz.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(gz.exists(_._2 == 1019L)) // the 1000-byte body + HTTP envelope
    df.unpersist()
  }

  test("streaming read resumes from the checkpointed file offset without replay") {
    val land = Files.createTempDirectory("warc_land")
    val ckpt = Files.createTempDirectory("warc_ckpt").toString
    val sink = Files.createTempDirectory("warc_sink").toString
    def drain(): Unit = {
      val q = spark.readStream.format("warc")
        .option("maxFilesPerTrigger", "1")
        .load(land.toString)
        .select(col("src_file"), col("record_index"))
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // first arrival: a.warc only
    Files.copy(Paths.get(s"$dir/a.warc"), land.resolve("a.warc"))
    drain()
    assert(spark.read.parquet(sink).count() == 4)
    // second arrival lands AFTER the first drain; the restarted query
    // must pick up exactly the new file — a re-read of a.warc would
    // surface as duplicate (src_file, record_index) rows
    Files.copy(Paths.get(s"$dir/b.warc.gz"), land.resolve("b.warc.gz"))
    drain()
    val rows = spark.read.parquet(sink)
      .groupBy(col("src_file"), col("record_index")).count()
      .collect()
    assert(rows.length == 7, s"expected 7 distinct records, got ${rows.length}")
    assert(rows.forall(_.getLong(2) == 1L), "resume replayed already-read files")
  }

  test("truncated records and bad framing fail loudly, not silently") {
    val tmp = Files.createTempDirectory("warc_trunc")
    val src = Files.readAllBytes(Paths.get(s"$dir/a.warc"))
    // cut the file mid-payload of the last record
    Files.write(tmp.resolve("t.warc"), src.take(src.length - 10),
      StandardOpenOption.CREATE)
    val e = intercept[Exception] {
      graft.sources.Warc.recordIndex(spark, tmp.toString)
    }
    assert(e.getMessage != null)
    // a non-WARC file is rejected at the version line
    Files.write(tmp.resolve("u.warc"), "not a warc\r\n".getBytes("UTF-8"),
      StandardOpenOption.CREATE)
    val e2 = intercept[Exception] {
      graft.sources.Warc.recordIndex(spark, tmp.resolve("u.warc").toString)
    }
    assert(e2.getMessage.contains("WARC/"))
  }

  test("a file landing mid-trigger inside the admitted range stays out of the in-flight batch") {
    import graft.sources.{WarcMicroBatchStream, WarcOffset}
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    spark.version // the stream resolves SparkSession.active lazily
    val land = Files.createTempDirectory("warc_race")
    // admitted listing: a.warc and c.warc (c sorts last)
    Files.copy(Paths.get(s"$dir/a.warc"), land.resolve("a.warc"))
    Files.copy(Paths.get(s"$dir/a.warc"), land.resolve("c.warc"))
    val stream = new WarcMicroBatchStream(land.toString, None)
    val start = stream.initialOffset()
    val end = stream.latestOffset(start, ReadLimit.allAvailable())
    assert(end.asInstanceOf[WarcOffset].last.endsWith("c.warc"))
    // b.warc lands AFTER admission, with a name inside ("", "c.warc"]
    Files.copy(Paths.get(s"$dir/a.warc"), land.resolve("b.warc"))
    val planned = stream.planInputPartitions(start, end)
    val files = planned.flatMap(
      _.asInstanceOf[graft.sources.WarcInputPartition].ranges.map(_.file))
      .map(p => p.substring(p.lastIndexOf('/') + 1)).distinct.sorted
    assert(files.toSeq == Seq("a.warc", "c.warc"),
      s"mid-trigger arrival leaked into the planned batch: ${files.toSeq}")
    // ...and the NEXT trigger's fresh listing cannot admit it either
    // (its name sorts below the committed offset — the documented
    // benign-skip for a non-monotone producer), so the stream neither
    // replays nor double-reads: a second admission from `end` is empty
    val end2 = stream.latestOffset(end, ReadLimit.allAvailable())
    assert(end2.asInstanceOf[WarcOffset].last.endsWith("c.warc"))
  }

  test("offset json round-trips and truncated escapes fail with the malformed diagnostic") {
    import graft.sources.WarcOffset
    for (name <- Seq("", "plain.warc", "q\"uote\\back\tctl.warc")) {
      assert(WarcOffset.fromJson(WarcOffset(name).json()).last == name)
    }
    // corrupted checkpoint: escape cut mid-sequence must hit the
    // malformed-offset require, not a StringIndexOutOfBoundsException
    for (bad <- Seq("{\"last\":\"x\\\"}", "{\"last\":\"x\\u00\"}")) {
      val e = intercept[IllegalArgumentException](WarcOffset.fromJson(bad))
      assert(e.getMessage.contains("malformed warc offset"))
    }
  }
}
