package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.streaming.OutputMode

/** ST5: the ingest status state machine
  * PENDING → PROCESSING → SYNCED | FAILED
  * (reference: src/shared/schemas.py:9-13, vector_store.py:74-94 —
  * registry rows flip status as the RQ worker advances).
  *
  * Streaming form: `mapGroupsWithState` keyed by content id; each
  * event attempts a transition, illegal transitions are ignored (the
  * reference's UPDATE-where-status semantics). State is O(1) per key;
  * pass `idleTtlMs > 0` to evict idle keys on processing-time timeout
  * (bounded by the active key set — use for continuous streams). The
  * default keeps state for the query's lifetime, which is what batch
  * and `Trigger.AvailableNow` drain-runs need.
  */
object StatusMachine {

  case class StatusEvent(content_id: String, event: String, at: Long)
  case class StatusRow(content_id: String, status: String, updated_at: Long)

  val transitions: Map[(String, String), String] = Map(
    ("PENDING", "start")    -> "PROCESSING",
    ("PROCESSING", "ok")    -> "SYNCED",
    ("PROCESSING", "fail")  -> "FAILED",
    ("FAILED", "retry")     -> "PENDING",
    ("SYNCED", "invalidate") -> "PENDING")

  def step(current: String, event: String): String =
    transitions.getOrElse((current, event), current)

  /** Suggested idle TTL for long-lived streams (30 min). */
  val SuggestedIdleTtlMs: Long = 30 * 60 * 1000L

  /** Visible for testing (TestGroupState): one micro-batch step for a
    * key. Evicts state on processing-time timeout when a TTL is set —
    * the timed-out key re-emits its final status once, then is gone. */
  private[graft] def update(idleTtlMs: Long)(
      id: String, events: Iterator[StatusEvent],
      state: GroupState[StatusRow]): StatusRow = {
    if (state.hasTimedOut) {
      val last = state.getOption.getOrElse(StatusRow(id, "PENDING", 0L))
      state.remove() // evict idle key; re-emits its final status once
      last
    } else {
      val start = state.getOption.getOrElse(StatusRow(id, "PENDING", 0L))
      // deterministic order regardless of micro-batch arrival interleaving
      val next = events.toSeq.sortBy(e => (e.at, e.event)).foldLeft(start) { (acc, e) =>
        StatusRow(id, step(acc.status, e.event), e.at)
      }
      state.update(next)
      if (idleTtlMs > 0) state.setTimeoutDuration(idleTtlMs)
      next
    }
  }

  /** Works on both batch and streaming grouped Datasets.
    *
    * `idleTtlMs > 0` enables processing-time idle eviction, keeping
    * state bounded by the ACTIVE key set — use it for continuous
    * streams ([[SuggestedIdleTtlMs]]). The default 0 keeps state for
    * the life of the query (NoTimeout): correct for batch and
    * drain-and-stop `Trigger.AvailableNow` runs, where pending
    * timeouts would otherwise hold the query open, but unbounded in
    * key cardinality on a forever-stream. */
  def run(events: Dataset[StatusEvent], idleTtlMs: Long = 0L): Dataset[StatusRow] = {
    implicit val enc = Encoders.product[StatusRow]
    implicit val senc = Encoders.STRING
    val timeout = if (idleTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
                  else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.content_id)
      .mapGroupsWithState(timeout)(update(idleTtlMs))
  }

  case class Transition(content_id: String, from_status: String,
                        to_status: String, at: Long)

  /** Append-mode variant: emits one row per ACCEPTED transition (the
    * audit log the reference keeps implicitly in updated_at churn) via
    * `flatMapGroupsWithState` — zero rows for ignored/illegal events,
    * state identical to [[run]]. */
  def transitions(events: Dataset[StatusEvent],
                  idleTtlMs: Long = 0L): Dataset[Transition] = {
    implicit val enc = Encoders.product[Transition]
    implicit val senc = Encoders.STRING
    implicit val stenc = Encoders.product[StatusRow] // state encoder
    val timeout = if (idleTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
                  else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.content_id)
      .flatMapGroupsWithState(OutputMode.Append(), timeout) {
        (id: String, evs: Iterator[StatusEvent], state: GroupState[StatusRow]) =>
          if (state.hasTimedOut) {
            state.remove() // idle eviction: no rows, audit log already emitted
            Iterator.empty
          } else {
            val start = state.getOption.getOrElse(StatusRow(id, "PENDING", 0L))
            val (endState, log) = evs.toSeq.sortBy(e => (e.at, e.event))
              .foldLeft((start, List.empty[Transition])) { case ((acc, out), e) =>
                val next = step(acc.status, e.event)
                if (next != acc.status)
                  (StatusRow(id, next, e.at), Transition(id, acc.status, next, e.at) :: out)
                else (acc, out)
              }
            state.update(endState)
            if (idleTtlMs > 0) state.setTimeoutDuration(idleTtlMs)
            log.reverse.iterator
          }
      }
  }
}
