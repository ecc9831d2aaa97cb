package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AnalyticsSpec extends SparkSpec {

  test("asof join picks the most recent order at-or-before each event") {
    val rows = Analytics.asofLastOrder(spark, sf0001)
      .withColumn("ts2", lit(null)) // no-op keeps test shape obvious
      .drop("ts2").collect()
    assert(rows.nonEmpty)

    // cross-check a sample of events against a naive per-row computation
    // (timestamps collected as epoch millis — parquet cols are TIMESTAMP_NTZ)
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts").cast("timestamp")).as("ms"))
      .limit(50).collect()
    val orders = graft.Tables.orders(spark, sf0001)
      .select(col("o_custkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("ms"),
        col("o_orderkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val got = Analytics.asofLastOrder(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    ev.foreach { e =>
      val (eid, uid, ts) = (e.getLong(0), e.getLong(1), e.getLong(2))
      val cand = orders.filter(o => o._1 == uid && o._2 <= ts)
      val expect =
        if (cand.isEmpty) None
        else {
          val maxTs = cand.map(_._2).max
          Some(cand.filter(_._2 == maxTs).map(_._3).max)
        }
      assert(got(eid) === expect, s"event $eid user $uid")
    }
  }

  test("vector-sum Aggregator sums duplicate keys (Vectors.sum semantics)") {
    val s = spark
    import s.implicits._
    val ds = Seq(
      (1L, 10L, 1.5), (1L, 10L, 2.5), (1L, 11L, 1.0),
      (2L, 10L, 4.0)
    ).toDS()
    val vec = ds.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(graft.functions.SparseVectorSum.toColumn.name("vec"))
      .collect().toMap
    assert(vec(1L) === Map(10L -> 4.0, 11L -> 1.0))
    assert(vec(2L) === Map(10L -> 4.0))
  }

  test("band join covers every order exactly once") {
    val n = Analytics.bandJoinPriceTiers(spark, sf0001)
      .agg(sum("n")).collect()(0).getLong(0)
    val total = graft.Tables.orders(spark, sf0001).count()
    assert(n === total)
  }

  test("cube includes all four grouping-set shapes") {
    val rows = Analytics.cubeFlags(spark, sf0001).collect()
    val shapes = rows.map(r => (r.isNullAt(0), r.isNullAt(1))).distinct.toSet
    assert(shapes === Set((false, false), (false, true), (true, false), (true, true)))
  }
}
