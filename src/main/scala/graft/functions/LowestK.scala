package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumns
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded lowest-k DISTINCT aggregate over a BIGINT column: per group,
  * the k smallest distinct values, ascending — exactly
  * `slice(sort_array(collect_set(x)), 1, k)` (which is how the callers'
  * oracles pin it), but with a HARD per-group buffer bound.
  *
  * Why it exists (r19, advice item on Graph.cappedPairs): collect_set's
  * buffer is heap-only and unbounded per group — the basket cap there was
  * applied only AFTER the whole distinct set was collected, so a
  * degenerate hub key (the 10^10-pair threat model the cap defends
  * against) could OOM a task before the slice ever ran. This buffer is a
  * TreeSet that never exceeds k+1 entries (insert, then evict the
  * largest), so per-group state is O(k) by construction, map-side
  * included, and eviction-to-k-smallest is monotone-safe: any value in
  * the final k smallest distinct values is, at every eviction point where
  * it is present, among the k smallest present — never discarded.
  *
  * Implemented as a TypedImperativeAggregate (the same ObjectHashAggregate
  * machinery collect_set itself uses) rather than a typed Aggregator
  * udaf: the udaf form A/B'd ~1-4 s slower per g-family query from
  * encoder/adapter overhead on its first run. Nulls are skipped exactly
  * like collect_set.
  */
case class LowestK(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {
  require(k > 0)

  override def prettyName: String = "graft_lowest_k"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BIGINT input, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      // skip values that provably can't enter the k smallest: the common
      // hot-group case degrades to one comparison against the max
      if (buf.size < k || x < buf.last()) {
        buf.add(x)
        if (buf.size > k) buf.pollLast()
      }
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) {
      val x = it.next()
      if (b1.size < k || x < b1.last()) {
        b1.add(x)
        if (b1.size > k) b1.pollLast()
      }
    }
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 } // TreeSet: ascending
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size * 8)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = createAggregationBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) buf.add(bb.getLong)
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): LowestK =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): LowestK =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): LowestK =
    copy(child = c)
}

object LowestK {
  /** `slice(sort_array(collect_set(c)), 1, k)` with O(k) per-group state. */
  def lowestK(c: Column, k: Int): Column =
    GraftColumns.column(
      LowestK(GraftColumns.expression(c), k).toAggregateExpression())
}
