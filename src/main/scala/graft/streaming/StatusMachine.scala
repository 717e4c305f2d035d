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
  * reference's UPDATE-where-status semantics). State is O(1) per key
  * and evicted on processing-time timeout, so the operator is bounded
  * regardless of stream length.
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

  private def update(id: String, events: Iterator[StatusEvent],
                     state: GroupState[StatusRow]): StatusRow = {
    val start = state.getOption.getOrElse(StatusRow(id, "PENDING", 0L))
    // deterministic order regardless of micro-batch arrival interleaving
    val next = events.toSeq.sortBy(e => (e.at, e.event)).foldLeft(start) { (acc, e) =>
      StatusRow(id, step(acc.status, e.event), e.at)
    }
    state.update(next)
    next
  }

  /** Works on both batch and streaming grouped Datasets. */
  def run(events: Dataset[StatusEvent]): Dataset[StatusRow] = {
    implicit val enc = Encoders.product[StatusRow]
    implicit val senc = Encoders.STRING
    events.groupByKey(_.content_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
  }

  case class Transition(content_id: String, from_status: String,
                        to_status: String, at: Long)

  /** Append-mode variant: emits one row per ACCEPTED transition (the
    * audit log the reference keeps implicitly in updated_at churn) via
    * `flatMapGroupsWithState` — zero rows for ignored/illegal events,
    * state identical to [[run]]. */
  def transitions(events: Dataset[StatusEvent]): Dataset[Transition] = {
    implicit val enc = Encoders.product[Transition]
    implicit val senc = Encoders.STRING
    implicit val stenc = Encoders.product[StatusRow] // state encoder
    events.groupByKey(_.content_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (id: String, evs: Iterator[StatusEvent], state: GroupState[StatusRow]) =>
          val start = state.getOption.getOrElse(StatusRow(id, "PENDING", 0L))
          val (endState, log) = evs.toSeq.sortBy(e => (e.at, e.event))
            .foldLeft((start, List.empty[Transition])) { case ((acc, out), e) =>
              val next = step(acc.status, e.event)
              if (next != acc.status)
                (StatusRow(id, next, e.at), Transition(id, acc.status, next, e.at) :: out)
              else (acc, out)
            }
          state.update(endState)
          log.reverse.iterator
      }
  }
}
