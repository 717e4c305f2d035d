package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}

/** External-call partition operators (HTTP detail fetch, LLM
  * embedding/vision calls) — the reference's per-record provider
  * fetches with anti-rate-limit sleeps (reference:
  * src/ETL_PROPERTIES/providers/base_provider.py:111-180,
  * realhomes_provider.py:69-139; LLM calls vector_store.py:55-68,
  * image_ai_tagger.py:137-174).
  *
  * Frame, not transport: the transport is an injected function so
  * tests (and this zero-egress environment) use deterministic fakes,
  * while the Spark-side semantics are real:
  *  - `mapPartitions` so connection/client setup happens once per
  *    task, never per row;
  *  - a token-bucket rate limiter PER PARTITION — aggregate request
  *    rate = partitions × ratePerSec, so callers size
  *    `repartition(n)` to the provider's global budget (the
  *    distributed analog of the reference's 0.5-1.5 s sleeps);
  *  - bounded retries with deterministic exponential backoff;
  *  - failures become rows (Left-style error column), never task
  *    aborts — one bad record must not kill a 100 TB job (the
  *    reference's commit-per-property fault isolation,
  *    properties_poi_matcher.py:98-148).
  */
object ExternalFetch {

  final case class FetchResult[B](input: B, output: Option[String], error: Option[String],
                                  attempts: Int)

  /** Minimal deterministic token bucket (no wall-clock dependence in
    * tests: `sleeper` is injectable). */
  final class RateLimiter(ratePerSec: Double, sleeper: Long => Unit = Thread.sleep) {
    private val intervalNanos = (1e9 / ratePerSec).toLong
    private var nextFree = 0L
    def acquire(): Unit = {
      val now = System.nanoTime()
      if (now < nextFree) sleeper((nextFree - now) / 1000000L max 1L)
      nextFree = math.max(now, nextFree) + intervalNanos
    }
  }

  /** @param fetch    the transport: input → payload (throws on failure)
    * @param ratePerSec per-partition request budget
    * @param maxRetries attempts = maxRetries + 1
    * @param backoffMs  base backoff, doubled per retry */
  def fetchPartitioned[B: Encoder](inputs: Dataset[B], fetch: B => String,
                                   ratePerSec: Double, maxRetries: Int = 2,
                                   backoffMs: Long = 100L,
                                   sleeper: Long => Unit = Thread.sleep)(
      implicit e: Encoder[FetchResult[B]]): Dataset[FetchResult[B]] = {
    inputs.mapPartitions { it =>
      // per-task setup: client + limiter initialized once
      val limiter = new RateLimiter(ratePerSec, sleeper)
      it.map { in =>
        var attempt = 0
        var result: FetchResult[B] = null
        while (result == null) {
          attempt += 1
          limiter.acquire()
          try result = FetchResult(in, Some(fetch(in)), None, attempt)
          catch {
            case scala.util.control.NonFatal(ex) =>
              if (attempt > maxRetries)
                result = FetchResult(in, None, Some(ex.getMessage), attempt)
              else sleeper(backoffMs << (attempt - 1))
          }
        }
        result
      }
    }
  }
}
