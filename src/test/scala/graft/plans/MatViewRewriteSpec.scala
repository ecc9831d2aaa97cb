package graft.plans

import graft.SparkSpec

class MatViewRewriteSpec extends SparkSpec {

  test("mv rewrite: the view scan replaces the fact scan; results equal the raw aggregation") {
    MatViews.stageDailyRollup(spark, sf0001)
    val df = MatViews.naiveDailyRollup(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_mv_daily"),
      s"rewrite did not fire — no view scan in the plan:\n$plan")
    assert(!plan.contains("events.parquet"),
      s"rewritten plan still reads the fact table:\n$plan")
    // semantics unchanged: the view-backed answer IS the raw answer
    val got = df.collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val raw = MatViews.withoutRewrite {
      MatViews.naiveDailyRollup(spark, sf0001).collect()
        .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2))
    }
    assert(raw.nonEmpty)
    assert(got.toSeq == raw.toSeq, "view-backed result diverges from raw aggregation")
    // the bypass really bypassed: the guarded run scanned the fact table
    val rawPlan = MatViews.withoutRewrite {
      MatViews.naiveDailyRollup(spark, sf0001).queryExecution.executedPlan.toString
    }
    assert(rawPlan.contains("events.parquet"), s"bypass still rewrote:\n$rawPlan")
  }

  test("mv rewrite: non-matching aggregates over the same table are left alone") {
    MatViews.stageDailyRollup(spark, sf0001)
    // same source, different shape (extra filter): must NOT be rewritten
    import org.apache.spark.sql.functions._
    val other = graft.Tables.events(spark, sf0001)
      .filter(col("event_type") === "view")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val plan = other.queryExecution.executedPlan.toString
    assert(!plan.contains("graft_mv_daily"),
      s"rewrite fired on a non-matching query:\n$plan")
  }
}
