package graft

import graft.operators.ExternalFetch
import graft.operators.ExternalFetch.FetchResult

class ExternalFetchSpec extends SparkSpec {
  import spark.implicits._

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
