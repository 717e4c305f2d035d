package graft

import graft.operators.ExternalFetch
import graft.operators.ExternalFetch.FetchResult
import org.apache.spark.sql.functions._

class ExternalFetchSpec extends SparkSpec {
  import spark.implicits._

  /** Two records per data page, ids unique across (shard, page). */
  private def pageJson(shard: String, page: Int): String = {
    val base = (shard.hashCode.abs % 10) * 100 + page * 10
    s"""[{"id":${base + 1},"name":"$shard-$page-1"},{"id":${base + 2},"name":"$shard-$page-2"}]"""
  }

  test("fetch succeeds, retries transient failures, isolates permanent ones") {
    val inputs = spark.range(0, 20).as[Long].repartition(2)
    // deterministic transient failure: ids % 5 == 1 fail on the first
    // attempt only (attempt tracked via a thread-local per partition);
    // ids % 7 == 6 always fail
    val fetch: Long => String = { id =>
      if (id % 7 == 6) throw new RuntimeException(s"permanent $id")
      ExternalFetchSpec.counter.synchronized {
        val k = ExternalFetchSpec.counter.getOrElseUpdate(id, 0)
        ExternalFetchSpec.counter(id) = k + 1
        if (id % 5 == 1 && k == 0) throw new RuntimeException(s"transient $id")
      }
      s"payload-$id"
    }
    val out: Map[Long, FetchResult[Long]] =
      ExternalFetch.fetchPartitioned(inputs, fetch,
        ratePerSec = 1e6, sleeper = _ => ())
        .collect().map(r => r.input -> r).toMap
    assert(out.size == 20)
    val permanentFails = out.values.filter(_.error.isDefined)
    assert(permanentFails.map(_.input).toSet == (0L until 20L).filter(_ % 7 == 6).toSet)
    assert(permanentFails.forall(_.attempts == 3)) // maxRetries=2 → 3 attempts
    val retried = out(11L) // 11 % 5 == 1, 11 % 7 != 6
    assert(retried.output.contains("payload-11") && retried.attempts == 2)
    assert(out(0L).attempts == 1 && out(0L).output.contains("payload-0"))
  }

  test("paginated scan drains a real loopback HTTP API with 429 retry and 500 isolation") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    import graft.operators.ExternalFetch.PageResult
    // In-JVM server on 127.0.0.1 (zero egress): /items?shard=S&page=N.
    //  - shard a: pages 1-3 carry 2 records each, page 4 is []
    //  - shard b: page 1 data; page 2 answers 429 on its FIRST attempt
    //    only (backoff must retry); page 3 is []
    //  - shard err: always 500 (must become an error row, not an abort)
    val hits = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/items", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val q = ex.getRequestURI.getQuery.split('&')
          .map(_.split("=", 2)).map(kv => kv(0) -> kv(1)).toMap
        val (shard, page) = (q("shard"), q("page").toInt)
        val attempt = hits.merge(s"$shard/$page", 1, (a, b) => a + b)
        def respond(code: Int, body: String): Unit = {
          val bytes = body.getBytes("UTF-8")
          ex.sendResponseHeaders(code, bytes.length)
          ex.getResponseBody.write(bytes)
          ex.close()
        }
        (shard, page) match {
          case ("err", _)                       => respond(500, "boom")
          case ("b", 2) if attempt == 1         => respond(429, "slow down")
          case ("a", p) if p <= 3               => respond(200, pageJson(shard, p))
          case ("b", p) if p <= 2               => respond(200, pageJson(shard, p))
          case _                                => respond(200, "[]")
        }
      }
    })
    server.start()
    val port = server.getAddress.getPort
    try {
      val fetchPage: (String, Int) => String = { (shard, page) =>
        val url = new java.net.URL(s"http://127.0.0.1:$port/items?shard=$shard&page=$page")
        val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
        try {
          val code = conn.getResponseCode
          if (code != 200) throw new RuntimeException(s"HTTP $code")
          new String(conn.getInputStream.readAllBytes(), "UTF-8")
        } finally conn.disconnect()
      }
      val cursors = Seq("a", "b", "err").toDS().repartition(3)
      val out: Seq[PageResult[String]] = ExternalFetch.paginateAll(
        cursors, fetchPage, isLast = _.trim == "[]",
        maxPages = 10, ratePerSec = 1e6, sleeper = _ => ()).collect().toSeq

      val byShard = out.groupBy(_.cursor)
      // termination: empty page ends the walk well before maxPages
      assert(byShard("a").map(_.page).sorted == Seq(1, 2, 3, 4))
      assert(byShard("a").forall(r => r.error.isEmpty && r.attempts == 1))
      // the 429 consumed one backoff retry, then succeeded
      val b2 = byShard("b").find(_.page == 2).get
      assert(b2.attempts == 2 && b2.payload.contains(pageJson("b", 2)))
      assert(byShard("b").map(_.page).sorted == Seq(1, 2, 3))
      // permanent 500: one error row, walk stopped, scan survived
      assert(byShard("err") match {
        case Seq(r) => r.error.exists(_.contains("HTTP 500")) && r.attempts == 3
        case _      => false
      })
      // the scan is a usable source: flatten payload pages to records
      val pages = out.filter(r => r.error.isEmpty && r.payload.exists(_.trim != "[]"))
        .map(r => (r.cursor, r.page, r.payload.get))
        .toDF("shard", "page", "payload")
      val recs = pages.select(explode(from_json(col("payload"),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType)
        ))))).as("r")).select("r.id", "r.name")
      assert(recs.count() == 10) // a: 3 pages × 2, b: 2 pages × 2
      // per-(shard,page) server hit counts: exactly one extra for b/2
      assert(hits.get("b/2") == 2 && hits.get("a/1") == 1 && hits.get("err/1") == 3)
    } finally server.stop(0)
  }

  test("paginateAll marks a maxPages-clipped walk as truncated") {
    import graft.operators.ExternalFetch
    import graft.operators.ExternalFetch.PageResult
    import spark.implicits._
    val cursors = Seq("endless", "short").toDS()
    val out: Seq[PageResult[String]] = ExternalFetch.paginateAll(
      cursors,
      (c: String, p: Int) => if (c == "short" && p >= 2) "[]" else s"""[{"p":$p}]""",
      isLast = _.trim == "[]", maxPages = 3, ratePerSec = 1e6,
      sleeper = _ => ()).collect().toSeq
    val byC = out.groupBy(_.cursor)
    // clipped walk: exactly the final row carries the marker, so a
    // consumer can tell an incomplete cursor from a drained one
    assert(byC("endless").map(r => r.page -> r.truncated).sortBy(_._1) ==
      Seq(1 -> false, 2 -> false, 3 -> true))
    // naturally-ended walk: never marked
    assert(byC("short").forall(!_.truncated))
  }

  test("rate limiter spaces acquisitions") {
    var slept = 0L
    val rl = new ExternalFetch.RateLimiter(1000.0, ms => slept += ms)
    (1 to 5).foreach(_ => rl.acquire())
    assert(slept >= 3) // ~1ms interval → at least a few ms of imposed waiting
  }
}

object ExternalFetchSpec {
  val counter: scala.collection.mutable.Map[Long, Int] =
    scala.collection.mutable.Map.empty
}
