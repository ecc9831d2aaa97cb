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
object TopK {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._

  /** Bounded per-group top-k as a reusable plan fragment: ranks `id` by
    * `score` (desc, ties → smaller id) within each `group` and keeps the
    * k best — the ObjectHashAggregate form every serving/ranking path in
    * the engine routes through instead of a `row_number` window, so the
    * shuffle carries O(groups·k) pairs, not every scored row, and no
    * group is ever globally sorted. Output columns, in order:
    * (`group` LONG, `rankCol` INT 1-based, `id` LONG, `score` DOUBLE);
    * callers re-cast narrow key types at the (groups·k)-sized output.
    * Result order within a group is EXACTLY the window form's, so
    * window-based oracles stay valid.
    */
  def perGroup(df: DataFrame, group: String, score: String, id: String,
      k: Int, rankCol: String = "rank"): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col(group).cast("long"), col(score).cast("double"), col(id).cast("long"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, sc, i) => (sc, i) }
      .agg(TopK(k).toColumn.name("top"))
      .toDF(group, "top")
      .select(col(group), posexplode(col("top")).as(Seq("idx", "t")))
      .select(col(group), (col("idx") + 1).cast("int").as(rankCol),
        col("t._2").as(id), col("t._1").as(score))
  }
}

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
