package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("custom as-of exec matches a brute-force latest-at-or-before on sf0.001") {
    val ev = graft.Tables.events(spark, sf0001)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
    val got = AsOf.join(clicks, views, "user_id", "v_user", "ts", "v_ts")
      .select(col("event_id"), col("v_ts"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.toString))
      .toMap
    // brute force: per click, max view ts at or before
    val want = clicks.join(views,
        col("user_id") === col("v_user") && col("v_ts") <= col("ts"), "left")
      .groupBy("event_id").agg(max("v_ts").as("v_ts"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.toString))
      .toMap
    assert(got.size == want.size)
    assert(got == want)
    // outer semantics genuinely exercised
    assert(got.values.exists(_.isEmpty), "fixture has no view-less clicks")
    assert(got.values.exists(_.nonEmpty), "fixture has no matched clicks")
  }

  test("as-of boundary: equal timestamp matches; strictly-later view does not") {
    val left = Seq((1L, 100L), (1L, 200L), (2L, 100L))
      .toDF("k", "t").withColumn("t", timestamp_millis(col("t")))
    val right = Seq((1L, 100L, "at"), (1L, 150L, "mid"), (2L, 101L, "late"))
      .toDF("rk", "rt", "tag").withColumn("rt", timestamp_millis(col("rt")))
    val got = AsOf.join(left, right, "k", "rk", "t", "rt")
      .select(col("k"), unix_millis(col("t")).as("t"), col("tag"))
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2))))
      .toSet
    assert(got == Set(
      (1L, 100L, Some("at")),   // v_ts == t: included (≤, not <)
      (1L, 200L, Some("mid")),  // latest of {at, mid}
      (2L, 100L, None)))        // only right row is later → null
  }

  test("as-of input types: DATE widens to timestamp; int/string rejected") {
    // the exec reads keys/times as raw 64-bit longs, so a DateType (int
    // days) column fed straight in would compare garbage — the entry
    // point must widen it; the boundary semantics must survive widening
    val left = Seq((1L, "2024-03-10"), (1L, "2024-03-15"), (2L, "2024-03-10"))
      .toDF("k", "d").withColumn("d", to_date(col("d")))
    val right = Seq((1L, "2024-03-10", "at"), (1L, "2024-03-12", "mid"),
        (2L, "2024-03-11", "late"))
      .toDF("rk", "rd", "tag").withColumn("rd", to_date(col("rd")))
    val got = AsOf.join(left, right, "k", "rk", "d", "rd")
      .select(col("k"), date_format(col("d"), "yyyy-MM-dd").as("d"), col("tag"))
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
      .toSet
    assert(got == Set(
      (1L, "2024-03-10", Some("at")),  // same-day match included
      (1L, "2024-03-15", Some("mid")), // latest at-or-before
      (2L, "2024-03-10", None)))       // only right row is later → null
    // 32-bit-backed and non-temporal types must be rejected at plan time,
    // not silently mis-joined at run time
    val intLeft = Seq((1, 100L)).toDF("k", "t")
    val longRight = Seq((1L, 100L)).toDF("rk", "rt")
    val e1 = intercept[IllegalArgumentException] {
      AsOf.join(intLeft, longRight, "k", "rk", "t", "rt")
    }
    assert(e1.getMessage.contains("'k'"))
    val strTime = Seq((1L, "2024-01-01")).toDF("k", "t")
    val e2 = intercept[IllegalArgumentException] {
      AsOf.join(strTime, longRight.withColumnRenamed("rk", "k2"), "k", "k2", "t", "rt")
    }
    assert(e2.getMessage.contains("'t'"))
  }

  test("as-of plan: custom exec node, hash-clustered children, sorted inputs") {
    val ev = graft.Tables.events(spark, sf0001)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
    val df = AsOf.join(clicks, views, "user_id", "v_user", "ts", "v_ts")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom exec missing:\n$plan")
    assert(plan.contains("hashpartitioning(user_id"), s"left not clustered:\n$plan")
    assert(plan.contains("hashpartitioning(v_user"), s"right not clustered:\n$plan")
    assert(plan.contains("Sort [user_id"), s"left not sorted:\n$plan")
  }

  test("as-of fuzz: 2000 random rows with ties match brute force (seeded)") {
    val rnd = new scala.util.Random(20260813)
    // small key/time domains force heavy duplication: many left rows per
    // key, right ties on (key, time), keys present on only one side
    val left = Seq.fill(2000)((rnd.nextInt(40).toLong, rnd.nextInt(200).toLong))
      .toDF("k", "t").withColumn("t", timestamp_millis(col("t")))
      .repartition(7)
    val right = Seq.fill(1500)((rnd.nextInt(50).toLong, rnd.nextInt(200).toLong))
      .toDF("rk", "rt").withColumn("rt", timestamp_millis(col("rt")))
      .repartition(5)
    // compare on the matched TIME only: among right ties on (key, time)
    // the winning row is sort-order-arbitrary (documented contract), but
    // the time itself is unique per match
    val got = AsOf.join(left, right, "k", "rk", "t", "rt")
      .groupBy("k", "t").agg(count(lit(1)).as("n"),
        min(unix_millis(col("rt"))).as("lo"), max(unix_millis(col("rt"))).as("hi"))
      .collect().map(r => (r.getLong(0), r.get(1).toString) ->
        (r.getLong(2), Option(r.get(3)), Option(r.get(4)))).toMap
    val want = left.join(right,
        col("k") === col("rk") && col("rt") <= col("t"), "left")
      .groupBy("k", "t").agg(count(lit(1)).as("dup"),
        max(unix_millis(col("rt"))).as("m"))
      .collect().map(r => (r.getLong(0), r.get(1).toString) ->
        Option(r.get(3))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (key, (_, lo, hi)) =>
      assert(lo == hi, s"$key: tie group matched different times")
      assert(lo == want(key), s"$key: got $lo want ${want(key)}")
    }
  }

  test("as-of across many partitions: keys split over tasks stay correct") {
    // 200 keys × 10 left rows, right rows every 7 ms — forces multiple
    // keys per partition and partition boundaries between keys
    val left = (0 until 2000).map(i => (i % 200L, (i / 200L) * 10L))
      .toDF("k", "t").withColumn("t", timestamp_millis(col("t")))
      .repartition(16)
    val right = (0 until 1000).map(i => (i % 200L, i / 200L * 7L))
      .toDF("rk", "rt").withColumn("rt", timestamp_millis(col("rt")))
      .repartition(13)
    val got = AsOf.join(left, right, "k", "rk", "t", "rt")
      .agg(count(lit(1)), count(col("rt")),
        sum(unix_millis(col("rt"))).as("s"))
      .head()
    val want = left.join(right,
        col("k") === col("rk") && col("rt") <= col("t"), "left")
      .groupBy("k", "t").agg(max(unix_millis(col("rt"))).as("m"))
      .agg(count(lit(1)), count(col("m")), sum("m").as("s"))
      .head()
    assert(got.getLong(0) == want.getLong(0))
    assert(got.getLong(1) == want.getLong(1))
    assert(got.getLong(2) == want.getLong(2))
  }
}
