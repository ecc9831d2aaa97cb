package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k typed Aggregator: per group, keep the k largest
  * (score, id) pairs, ties broken by smaller id.
  *
  * The scale story vs the window-function top-k (`row_number() OVER ... <=
  * k`): a window must SHUFFLE AND SORT every row of the group; this
  * aggregator is planned as a two-phase ObjectHashAggregate, so each map
  * task reduces its slice of a group to ≤ k pairs before the shuffle —
  * shuffle volume is O(groups · k · partitions-touching-the-group), not
  * O(rows), and nothing is globally sorted. The buffer keeps up to 2k
  * entries between trims, bounding per-row cost at O(k) worst case and
  * amortized O(log k)-ish without a heap dependency.
  *
  * Results are EXACTLY the window form's for any k (same total order),
  * which is how the declared query is oracled.
  */
final case class TopK(k: Int) extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0)

  // descending score, ascending id — Spark's (DESC score, ASC id) window
  // order exactly: NaN ranks above +Inf (Double.compare semantics) and
  // -0.0 is collapsed to 0.0 first (SQL ordering treats them equal, so the
  // id tiebreak must apply); a naive Ordering.by(-s) gets both wrong
  private def norm(s: Double): Double = if (s == 0.0) 0.0 else s
  private def ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(norm(b._1), norm(a._1))
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  private def trim(buf: List[(Double, Long)]): List[(Double, Long)] =
    if (buf.lengthCompare(2 * k) > 0) buf.sorted(ord).take(k) else buf

  override def zero: List[(Double, Long)] = Nil

  override def reduce(buf: List[(Double, Long)], in: (Double, Long)): List[(Double, Long)] =
    trim(in :: buf)

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    trim(a ::: b)

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] =
    buf.sorted(ord).take(k)

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
