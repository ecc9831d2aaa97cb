package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SourcesSpec extends SparkSpec {

  test("bucketed join is sort-merge with no Exchange on either side") {
    // materializes the bucketed tables for sf0.001 as a side effect
    val agg = Sources.bucketedJoin(spark, sf0001)
    val viaBuckets = agg.collect().map(r => (r.getString(0), r.getLong(1))).toMap

    val (liTbl, oTbl) = Sources.bucketTableNames(sf0001)
    val bare = Sources.bucketedJoinPlan(spark, liTbl, oTbl)
    val plan = bare.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle either side:\n$plan")

    // same counts as the unbucketed join
    val plainCounts = graft.Tables.lineitem(spark, sf0001)
      .join(graft.Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(viaBuckets == plainCounts)
  }
}
