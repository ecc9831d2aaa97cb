package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded lowest-k DISTINCT long aggregator: per group, keep the k
  * smallest distinct values, ascending — exactly
  * `slice(sort_array(collect_set(x)), 1, k)` (which is how the callers'
  * oracles pin it), but with a HARD per-group buffer bound.
  *
  * Why it exists (r19, advice item on Graph.cappedPairs): collect_set's
  * TypedImperativeAggregate buffer is heap-only and unbounded per group —
  * the basket cap there is applied only AFTER the whole distinct set is
  * collected, so a degenerate hub key (the 10^10-pair threat model the
  * cap defends against) could OOM a task before the slice ever ran. This
  * buffer never holds more than 2k entries between trims (duplicates
  * included), so per-group state is O(k) by construction and the cap is
  * enforced DURING aggregation, map-side included.
  *
  * Trim-to-k-smallest is monotone-safe for the distinct-lowest-k result:
  * any value in the final k smallest distinct values is, at every trim
  * where it is present, among the k smallest present — so it is never
  * discarded. Nulls: callers must not feed null (collect_set dropped
  * them silently; every current caller's key is a non-null l_partkey —
  * the non-null precondition is asserted by the callers' filters).
  */
final case class LowestK(k: Int) extends Aggregator[Long, List[Long], Seq[Long]] {
  require(k > 0)

  private def trim(buf: List[Long]): List[Long] =
    if (buf.lengthCompare(2 * k) > 0) buf.distinct.sorted.take(k) else buf

  override def zero: List[Long] = Nil

  override def reduce(buf: List[Long], in: Long): List[Long] =
    trim(in :: buf)

  override def merge(a: List[Long], b: List[Long]): List[Long] =
    trim(a ::: b)

  override def finish(buf: List[Long]): Seq[Long] =
    buf.distinct.sorted.take(k)

  override def bufferEncoder: Encoder[List[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
