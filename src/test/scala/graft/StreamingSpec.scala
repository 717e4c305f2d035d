package graft

import graft.queries.EventQueries
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

/** Batch/stream parity: the streaming windowed aggregation over the
  * events table (fed through a real streaming source with watermark +
  * AvailableNow trigger) must equal the batch window aggregation. */
class StreamingSpec extends SparkSpec {

  test("streaming hourly agg equals batch hourly agg") {
    // Stage the (ns→µs converted) events as a parquet dir the stream reads.
    val batchDf = EventQueries.events(spark, sf001).cache()
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    batchDf.write.mode("overwrite").parquet(dir)

    val streamed = spark.readStream
      .schema(EventStreams.eventSchema)
      .parquet(dir)
    val agg = EventStreams.hourlyByType(streamed)
    val result = EventStreams.runAvailableNow(spark, agg, "hourly_test")
      .orderBy("hour_start", "event_type")

    val expected = EventStreams.hourlyByType(batchDf)
      .orderBy("hour_start", "event_type")
    assert(result.collect().toSeq == expected.collect().toSeq)
    assert(result.count() > 0)
  }

  test("streaming session windows produce bounded sessions") {
    val batchDf = EventQueries.events(spark, sf001)
    val dir = java.nio.file.Files.createTempDirectory("graft_stream2").toString
    batchDf.write.mode("overwrite").parquet(dir)
    val streamed = spark.readStream
      .schema(EventStreams.eventSchema).parquet(dir)
    val sessions = EventStreams.runAvailableNow(
      spark, EventStreams.sessionized(streamed), "sessions_test")
    assert(sessions.count() > 0)
    assert(sessions.filter(col("session_end") < col("session_start")).count() == 0)
  }
}
