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

  /** The attempt number of the in-flight call, visible to the
    * transport closure on the calling thread (mapPartitions runs the
    * closure on the task thread, so this is race-free). Lets a
    * transport tag requests with the retry ordinal — e.g. an
    * `X-Graft-Attempt` header — so server-side behavior keyed on
    * "first attempt" stays deterministic even when a task retry or
    * speculative duplicate replays the whole partition. */
  val currentAttempt = new ThreadLocal[Integer] {
    override def initialValue(): Integer = 1
  }

  /** One rate-limited call with bounded exponential-backoff retries:
    * (payload, error, attempts) — exactly one of payload/error set. */
  private def attemptCall(limiter: RateLimiter, maxRetries: Int, backoffMs: Long,
                          sleeper: Long => Unit)(
      call: () => String): (Option[String], Option[String], Int) = {
    var attempt = 0
    var out: (Option[String], Option[String], Int) = null
    // executor task threads are pooled: clear the ordinal once the
    // in-flight call completes, so a later transport call on a reused
    // thread never observes this task's stale attempt number
    try {
      while (out == null) {
        attempt += 1
        limiter.acquire()
        currentAttempt.set(attempt)
        try out = (Some(call()), None, attempt)
        catch {
          case scala.util.control.NonFatal(ex) =>
            if (attempt > maxRetries)
              // getMessage may be null (e.g. bare NPE) — an error row
              // with a null error column would masquerade as a success
              out = (None, Some(Option(ex.getMessage).getOrElse(ex.getClass.getName)),
                attempt)
            else sleeper(backoffMs << (attempt - 1))
        }
      }
      out
    } finally currentAttempt.remove()
  }

  /** S3 per-record detail fetch.
    * @param fetch    the transport: input → payload (throws on failure)
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
        val (payload, error, attempts) =
          attemptCall(limiter, maxRetries, backoffMs, sleeper)(() => fetch(in))
        FetchResult(in, payload, error, attempts)
      }
    }
  }

  /** `truncated` marks the LAST row of a walk that hit `maxPages`
    * while the cursor still had pages (no isLast, no error): without
    * it a clipped scan is indistinguishable from one that drained
    * naturally, and a consumer can't tell complete from incomplete. */
  final case class PageResult[B](cursor: B, page: Int, payload: Option[String],
                                 error: Option[String], attempts: Int,
                                 truncated: Boolean = false)

  /** S2 paginated API scan (reference provider loop,
    * realhomes_provider.py:21-67): PARALLEL across cursors (one
    * provider/city/shard each), SEQUENTIAL within a cursor — page N+1
    * is only known to exist after page N arrives, so the walk is an
    * iterator inside the task, never a driver loop. Each page is a
    * row; `isLast` (e.g. empty JSON array) ends the walk, `maxPages`
    * is the runaway guard, and a post-retry failure ends the walk as
    * an error ROW — a dead endpoint must not kill the scan of the
    * other thousand cursors. */
  def paginateAll[B: Encoder](cursors: Dataset[B], fetchPage: (B, Int) => String,
                              isLast: String => Boolean, maxPages: Int = 1000,
                              ratePerSec: Double = 10.0, maxRetries: Int = 2,
                              backoffMs: Long = 100L,
                              sleeper: Long => Unit = Thread.sleep)(
      implicit e: Encoder[PageResult[B]]): Dataset[PageResult[B]] = {
    cursors.mapPartitions { it =>
      val limiter = new RateLimiter(ratePerSec, sleeper)
      it.flatMap { c =>
        new Iterator[PageResult[B]] {
          private var page = 0
          private var done = false
          def hasNext: Boolean = !done && page < maxPages
          def next(): PageResult[B] = {
            page += 1
            val (payload, error, attempts) =
              attemptCall(limiter, maxRetries, backoffMs, sleeper)(() => fetchPage(c, page))
            if (error.isDefined || payload.exists(isLast)) done = true
            PageResult(c, page, payload, error, attempts,
              truncated = !done && page == maxPages)
          }
        }
      }
    }
  }
}
