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

  test("streaming dedup equals batch distinct; watermark variant evicts dedup state") {
    // declared-query side: full replay == batch distinct
    val streamed = EventStreams.streamDedup(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val batch = graft.Tables.events(spark, sf0001)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(streamed == batch)

    // bounded-state variant: duplicates within the watermark horizon are
    // dropped; once the watermark passes a key's horizon its state is
    // evicted, so the same key re-admits — the infinite-stream shape
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(java.sql.Timestamp, String)]
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    val deduped = src.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("k")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("graft_dedup_evict").start()
    try {
      src.addData((ts(0), "a"), (ts(5), "a")) // dup within horizon → dropped
      q.processAllAvailable()
      src.addData((ts(40), "b")) // watermark → 10:30, evicts a's state
      q.processAllAvailable()
      src.addData((ts(41), "a")) // same key after eviction → re-admitted
      q.processAllAvailable()
      val ks = spark.table("graft_dedup_evict").collect().map(_.getString(1))
      assert(ks.count(_ == "a") == 2, s"expected a re-admitted after eviction: ${ks.toSeq}")
      assert(ks.count(_ == "b") == 1)
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 2, s"dedup state not evicted: $stateRows rows")
    } finally q.stop()
  }

  test("append mode: watermark drops late data and bounds state size") {
    // Incremental semantics the complete-mode oracles can't show: a
    // window is emitted once (when the watermark passes its end) and
    // evicted from state; rows arriving behind the watermark are dropped
    // and counted in numRowsDroppedByWatermark.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(java.sql.Timestamp, Double)]
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    val windowed = src.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = windowed.writeStream.outputMode("append")
      .format("memory").queryName("graft_append_evict").start()
    try {
      src.addData((ts(0), 1.0), (ts(5), 1.0), (ts(25), 1.0))
      q.processAllAvailable() // watermark afterwards: 10:25 − 10m = 10:15
      // 10:02 is behind the 10:15 watermark → dropped, never re-opens the
      // already-closed [10:00,10:10) window; 10:40 advances the watermark
      src.addData((ts(2), 99.0), (ts(40), 1.0))
      q.processAllAvailable()
      src.addData((ts(59), 1.0))
      q.processAllAvailable()
      val dropped = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
      assert(dropped >= 1, "late event was not dropped by the watermark")
      val out = spark.table("graft_append_evict")
        .select(date_format(col("window.start"), "HH:mm").as("w"), col("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out.get("10:00").contains(2L),
        s"closed window must hold exactly the 2 on-time events: $out")
      // eviction bounds state: only the still-open trailing windows remain
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 3, s"state not bounded by eviction: $stateRows rows")
    } finally q.stop()
  }
}
