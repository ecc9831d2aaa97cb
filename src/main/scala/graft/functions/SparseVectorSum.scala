package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF replicating the reference's vector-sum combiner/reducer
  * exactly (`Vectors.sum` over singleton sparse vectors,
  * ALS-Hadoop/ALS/ALS.java:132-150): duplicate keys SUM into one sparse
  * vector per group.
  *
  * `reduce` is Spark's map-side combiner and `merge` the reduce-side
  * combine — the same partial-aggregation shape the reference hand-wires
  * with `VectorSumCombiner`, but expressed as an `Aggregator[IN, BUF, OUT]`
  * that Catalyst plans as a two-phase ObjectHashAggregate (no shuffle of
  * raw rows, only of partial maps).
  */
object SparseVectorSum extends Aggregator[(Long, Double), mutable.Map[Long, Double], Map[Long, Double]] {

  override def zero: mutable.Map[Long, Double] = mutable.Map.empty

  override def reduce(buf: mutable.Map[Long, Double], in: (Long, Double)): mutable.Map[Long, Double] = {
    buf.update(in._1, buf.getOrElse(in._1, 0.0) + in._2)
    buf
  }

  override def merge(a: mutable.Map[Long, Double], b: mutable.Map[Long, Double]): mutable.Map[Long, Double] = {
    b.foreach { case (k, v) => a.update(k, a.getOrElse(k, 0.0) + v) }
    a
  }

  override def finish(buf: mutable.Map[Long, Double]): Map[Long, Double] = buf.toMap

  override def bufferEncoder: Encoder[mutable.Map[Long, Double]] =
    Encoders.kryo[mutable.Map[Long, Double]]

  override def outputEncoder: Encoder[Map[Long, Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Double]]()
}
