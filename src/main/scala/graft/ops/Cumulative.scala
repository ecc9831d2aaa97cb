package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed global running total — the scalable replacement for
  * `Window.orderBy(...)` with no partition spec, which funnels the whole
  * input through ONE task and is the classic Pareto/decile scale-killer.
  *
  * Two-pass shape: range-repartition on the order columns (so partition i
  * holds a contiguous rank slice), compute per-partition totals and
  * collect them as prefix offsets — PARTITION-COUNT-sized, not
  * data-sized — then add each row's within-partition running sum to its
  * partition's offset. The only window that remains is partitioned by
  * `spark_partition_id()`, so every task sums its own slice in parallel;
  * no single-task Sort or Window node exists anywhere in the plan
  * (pinned in PlanShapeSpec).
  *
  * The value column must be integral (LongType): integer addition is
  * associative, so splitting the sum at partition boundaries is EXACTLY
  * the sequential result. A double column would make the answer depend
  * on where the range partitioner drew its boundaries — scale integer
  * cents/micros first (the caller owns the scaling).
  *
  * The ranged input is persisted (MEMORY_AND_DISK) because the offsets
  * job and the main pass are separate actions; the cache is
  * rollup-sized — the operator's input is expected to be an aggregate,
  * not a fact table — and spills rather than OOMs. It must outlive the
  * RETURNED lazy plan, so it is not unpersisted here: the harness clears
  * the session cache after each query's sink (Verify/Bench both do), and
  * embedding callers own the same contract.
  */
object Cumulative {

  /** Adds `out` = running total of `valueCol` (a LongType column) in the
    * total order given by `order`, computed with no single-task stage.
    */
  def runningTotal(df: DataFrame, valueCol: String, order: Seq[Column],
      out: String): DataFrame = {
    val s = df.sparkSession
    val n = s.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df.repartitionByRange(n, order: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    // one row per partition: the ONLY driver-side data in the operator
    val ptots = ranged.groupBy("__pid").agg(sum(col(valueCol)).as("__ptot"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets: Map[Int, Long] = {
      var acc = 0L
      ptots.map { case (pid, tot) =>
        val off = acc; acc += tot; pid -> off
      }.toMap
    }
    val w = Window.partitionBy("__pid").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .withColumn(out,
        sum(col(valueCol)).over(w) +
          coalesce(element_at(typedLit(offsets), col("__pid")), lit(0L)))
      .drop("__pid")
  }

  /** Adds `out` = 1-based global row number in the total order given by
    * `order` — `row_number().over(Window.orderBy(...))` without the
    * single-task stage. A rank is just the running count of rows, so
    * this is [[runningTotal]] of a constant 1: same two-pass shape, same
    * partition-count-sized driver data, exact by integer associativity.
    * The caller's `order` must be a total order (add a tiebreaker
    * column) or ties land in range-partitioner-dependent positions.
    */
  def globalRowNumber(df: DataFrame, order: Seq[Column], out: String): DataFrame =
    runningTotal(df.withColumn("__one", lit(1L)), "__one", order, out)
      .drop("__one")
}
