package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bottom-k DISTINCT sketch state (the KMV estimator's carrier,
  * Bar-Yossef et al. RANDOM'02): keeps the k smallest distinct hash
  * values seen, as a sorted ascending list.
  *
  * This is the PARTIAL-AGGREGATE form of q79's bottom-k: each map task
  * folds its rows into an O(k) buffer, partials merge by sorted-merge
  * keeping the k smallest of the union, and only k longs per
  * (partition, group) ever cross the wire — versus the window form,
  * which shuffles every distinct hash of a group into one task and
  * sorts it. Dedup happens inside the insert, so callers don't need a
  * `.distinct()` pre-shuffle either: the sketch IS the distinct set's
  * bottom-k.
  */
class BottomKDistinct(k: Int) extends Aggregator[Long, List[Long], Seq[Long]] {

  override def zero: List[Long] = Nil

  private def insert(buf: List[Long], v: Long): List[Long] = {
    val (smaller, rest) = buf.span(_ < v)
    if (rest.headOption.contains(v)) buf // already present
    else if (smaller.length >= k) buf // v is above the kth smallest
    else {
      val merged = smaller ::: (v :: rest)
      if (merged.length > k) merged.take(k) else merged
    }
  }

  override def reduce(buf: List[Long], v: Long): List[Long] = insert(buf, v)

  override def merge(a: List[Long], b: List[Long]): List[Long] =
    b.foldLeft(a)(insert)

  override def finish(buf: List[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[List[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
