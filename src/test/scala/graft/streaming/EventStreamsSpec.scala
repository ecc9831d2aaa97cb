package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventStreamsSpec extends SparkSpec {

  test("streaming windowed counts equal the batch aggregation") {
    val streamed = EventStreams.windowedCounts(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    val batch = graft.Tables.events(spark, sf0001)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(streamed == batch)
  }

  test("session windows: per-user session counts equal batch sessionization") {
    val streamed = EventStreams.sessionWindows(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = graft.ops.Relational.eventsSessionize(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(streamed == batch)
  }
}
