package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed single-pass top-k aggregator (Dataset `Aggregator` surface —
  * SURVEY §7.3's "TypedImperativeAggregate if bench demands" slot):
  * keeps a bounded ordered buffer per group, so a group's top-k costs
  * O(n·log k) with O(k) state instead of a full per-group sort. The
  * window row_number form (TopKPerGroup) shuffles whole groups; this
  * form pre-aggregates map-side — the better shape when groups are
  * huge and k is tiny.
  *
  * Ordering: score DESC, id ASC tie-break (deterministic, SURVEY
  * §7.4).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), List[(Double, Long)], Seq[(Long, Double)]] {

  override def zero: List[(Double, Long)] = Nil

  private def insert(buf: List[(Double, Long)], e: (Double, Long)): List[(Double, Long)] = {
    // descending score, ascending id; keep first k
    val (better, rest) = buf.span(b => b._1 > e._1 || (b._1 == e._1 && b._2 < e._2))
    val merged = better ::: (e :: rest)
    if (merged.length > k) merged.take(k) else merged
  }

  override def reduce(buf: List[(Double, Long)], in: (Long, Double)): List[(Double, Long)] =
    insert(buf, (in._2, in._1))

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: List[(Double, Long)]): Seq[(Long, Double)] =
    buf.map { case (score, id) => (id, score) }

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
}
