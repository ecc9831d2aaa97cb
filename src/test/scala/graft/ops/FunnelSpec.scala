package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, Long, String)*) =
    rows.toSeq.toDF("event_id", "ts_s", "user_id", "event_type")
      .select(col("event_id"), col("ts_s").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"))

  test("bounded sequence: gap boundaries, chain anchoring, monotone survivors") {
    // user 1: view 10:00 → click 10:30 → purchase 11:00  (full chain, tight)
    // user 2: click 09:00 → purchase 11:00               (no view before click within 1h)
    // user 3: purchase 11:00 with click 25h earlier       (outside the 24h gap)
    // user 4: view 09:31, click 10:31, purchase 11:00     (view exactly 1h before click: included, >= bound)
    val events = ev(
      (1, "2024-01-01 10:00:00", 1, "view"),
      (2, "2024-01-01 10:30:00", 1, "click"),
      (3, "2024-01-01 11:00:00", 1, "purchase"),
      (4, "2024-01-01 09:00:00", 2, "click"),
      (5, "2024-01-01 11:00:00", 2, "purchase"),
      (6, "2023-12-31 10:00:00", 3, "click"),
      (7, "2024-01-01 11:00:00", 3, "purchase"),
      (8, "2024-01-01 09:31:00", 4, "view"),
      (9, "2024-01-01 10:31:00", 4, "click"),
      (10, "2024-01-01 11:00:00", 4, "purchase"))
    val anchors = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("anchor_id"), col("user_id"), col("ts"))
    val r = Funnel.boundedSequence(events, anchors,
      Seq(("click", "24 HOURS"), ("view", "1 HOUR"))).head()
    assert(r.getLong(0) == 4, "four purchase anchors")
    // user 3's click is 25h old → only users 1, 2, 4 pass step 1
    assert(r.getLong(1) == 3, s"step_1: ${r.getLong(1)}")
    // user 2 has no view ≤ its click within 1h; user 4's view is EXACTLY
    // 1h before its click (inclusive bound) → users 1, 4 pass step 2
    assert(r.getLong(2) == 2, s"step_2: ${r.getLong(2)}")
    // survivors are monotone by construction
    assert(r.getLong(0) >= r.getLong(1) && r.getLong(1) >= r.getLong(2))
  }

  test("e9 equals its 2-step fold re-expression on real data") {
    // the fold must reproduce the hard-coded composition it replaced —
    // same counts on the sf0.001 events table
    val got = Behavior.timeBoundFunnel(spark, sf0001).head()
    val ev = graft.Tables.events(spark, sf0001)
    val anchors = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("anchor_id"), col("user_id"), col("ts"))
    val direct = Funnel.boundedSequence(ev, anchors,
      Seq(("click", "24 HOURS"), ("view", "1 HOUR"))).head()
    assert(got.getLong(0) == direct.getLong(0))
    assert(got.getLong(1) == direct.getLong(1))
    assert(got.getLong(2) == direct.getLong(2))
    assert(got.getLong(0) > 0 && got.getLong(2) > 0, "fixture exercises the full chain")
  }
}
