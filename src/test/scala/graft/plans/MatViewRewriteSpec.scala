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

  test("mv rewrite fires through the SQL front end: a spark.sql aggregate reads only the view") {
    // round-12 verdict item 8: the rule is plan-level, so a SQL-issued
    // aggregate over the registered store must get the SAME view swap
    // the DataFrame path gets — this pin closes the last unpinned
    // composition between the SQL front end and the cat tier
    MatViews.stageDailyRollup(spark, sf0001)
    graft.Tables.events(spark, sf0001).createOrReplaceTempView("events_sqlpin")
    val df = spark.sql(
      """SELECT to_date(ts) AS day, event_type, count(1) AS n,
        |  sum(cast(round(value * 100) as bigint)) AS cents
        |FROM events_sqlpin GROUP BY 1, 2""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_mv_daily"),
      s"SQL-issued aggregate was not view-swapped:\n$plan")
    assert(!plan.contains("events.parquet"),
      s"SQL-issued plan still reads the fact table:\n$plan")
    val got = df.collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val raw = MatViews.withoutRewrite {
      MatViews.naiveDailyRollup(spark, sf0001).collect()
        .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2))
    }
    assert(raw.nonEmpty && got.toSeq == raw.toSeq,
      "SQL-issued view-backed result diverges from the raw aggregation")
  }

  test("mv rewrite: non-derivable aggregates over the same table are left alone") {
    MatViews.stageDailyRollup(spark, sf0001)
    // same source, but the filter touches a NON-key column: must NOT be
    // rewritten (the view's groups can't express a value predicate)
    import org.apache.spark.sql.functions._
    val other = graft.Tables.events(spark, sf0001)
      .filter(col("value") > 5.0)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val plan = other.queryExecution.executedPlan.toString
    assert(!plan.contains("graft_mv_daily"),
      s"rewrite fired on a non-derivable query:\n$plan")
  }

  test("cat5: a key-derivable filter compensates onto the view; results equal raw") {
    import org.apache.spark.sql.functions._
    val df = graft.engine.GraftCatalog.mvFilterCompensation(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_mv_daily"),
      s"filter compensation did not fire:\n$plan")
    assert(!plan.contains("events.parquet"),
      s"compensated plan still scans the fact table:\n$plan")
    val expected = MatViews.withoutRewrite {
      graft.engine.GraftCatalog.mvFilterCompensation(spark, sf0001).collect()
    }
    assert(df.collect().toSeq == expected.toSeq)
    // a multi-value key predicate compensates too. (Spark lowers
    // to_date(ts) comparisons to raw-ts bounds before the rule sees
    // them; since cat9 the matcher recovers day predicates from the
    // midnight-aligned lowered form — pinned below.)
    val ranged = graft.Tables.events(spark, sf0001)
      .filter(col("event_type").isin("click", "view"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
    // (graft_mv_ not graft_mv_daily: once cat8 registers the monthly
    // view in this JVM, an event_type-only cut legitimately answers
    // from the cheaper view — the pin is zero-fact-IO, not which view)
    val rplan = ranged.queryExecution.executedPlan.toString
    assert(rplan.contains("graft_mv_") && !rplan.contains("events.parquet"),
      s"isin key filter should compensate:\n$rplan")
    val rexp = MatViews.withoutRewrite { ranged.collect() }
    assert(ranged.collect().sortBy(_.getString(0)).toSeq ==
      rexp.sortBy(_.getString(0)).toSeq)
    // the degenerate coarsening — the GLOBAL total (no grouping at all)
    // — compensates too: sum of all daily partials
    val global = graft.Tables.events(spark, sf0001)
      .agg(count(lit(1)).as("n"))
    val gplan = global.queryExecution.executedPlan.toString
    assert(gplan.contains("graft_mv_") && !gplan.contains("events.parquet"),
      s"global count should compensate from the view:\n$gplan")
    val gexp = MatViews.withoutRewrite { global.head().getLong(0) }
    assert(global.head().getLong(0) == gexp)
  }

  test("cat4 roll-up: the coarser aggregate reads ONLY the view and equals the raw answer") {
    import org.apache.spark.sql.functions._
    val df = graft.engine.GraftCatalog.mvRollupCompensation(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_mv_"),
      s"roll-up compensation did not fire:\n$plan")
    assert(!plan.contains("events.parquet"),
      s"compensated plan still scans the fact table:\n$plan")
    // bit-identical to the raw aggregation (exact integer partials)
    val expected = MatViews.withoutRewrite {
      graft.engine.GraftCatalog.mvRollupCompensation(spark, sf0001).collect()
    }
    assert(df.collect().toSeq == expected.toSeq)
  }

  test("cat4 roll-up: non-derivable aggregates and keys stay on the fact table") {
    MatViews.stageDailyRollup(spark, sf0001)
    import org.apache.spark.sql.functions._
    // sum(value) is NOT algebraic over the stored cents partials
    val rawSum = graft.Tables.events(spark, sf0001)
      .groupBy(col("event_type"))
      .agg(sum("value").as("v"))
    assert(!rawSum.queryExecution.executedPlan.toString.contains("graft_mv_"))
    // hour-grained key is FINER than the view's day key — underivable
    val hourly = graft.Tables.events(spark, sf0001)
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
    assert(!hourly.queryExecution.executedPlan.toString.contains("graft_mv_"))
    // a NON-DETERMINISTIC predicate has no column references, so the
    // key-closure test alone would pass it vacuously — but compensating
    // rand() onto the view samples whole GROUPS, not raw rows. Must stay
    // on the fact table.
    val sampled = graft.Tables.events(spark, sf0001)
      .filter(rand(42) < 0.5)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    assert(!sampled.queryExecution.executedPlan.toString.contains("graft_mv_"),
      "rewrite fired under a non-deterministic predicate")
    // count DISTINCT is not re-aggregatable from counts
    val dist = graft.Tables.events(spark, sf0001)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(countDistinct("user_id").as("u"))
    assert(!dist.queryExecution.executedPlan.toString.contains("graft_mv_"))
    // but the pure event_type marginal IS derivable — the whole point
    val marginal = graft.Tables.events(spark, sf0001)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(round(value * 100) as bigint)")).as("cents"))
    val mplan = marginal.queryExecution.executedPlan.toString
    assert(mplan.contains("graft_mv_") && !mplan.contains("events.parquet"),
      s"event_type marginal should compensate from the view:\n$mplan")
    val expected = MatViews.withoutRewrite { marginal.collect() }
    assert(marginal.collect().sortBy(_.getString(0)).toSeq ==
      expected.sortBy(_.getString(0)).toSeq)
  }

  test("cat7: an append maintains the registered view in delta cost; stale never serves") {
    import org.apache.spark.sql.functions._
    val store = graft.Tables.scratchDir("graft_cat7spec", sf0001)
    val ev = graft.Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    def files(): Set[String] =
      MatViews.listDataFiles(s"$store/events.parquet").keySet
    ev.filter(pmod(col("event_id"), lit(10)) =!= 7)
      .write.mode("overwrite").parquet(s"$store/events.parquet")
    MatViews.stageDailyRollup(spark, store)
    val baseFiles = files()
    ev.filter(pmod(col("event_id"), lit(10)) === 7)
      .write.mode("append").parquet(s"$store/events.parquet")
    val appendedFiles = files() -- baseFiles
    assert(appendedFiles.nonEmpty)
    // maintenance detects EXACTLY the appended files and merges — no restage
    val report = MatViews.maintainDailyRollup(spark, store)
    assert(!report.restaged, "append was answered by a full re-stage")
    assert(report.added == appendedFiles.size && report.removed == 0)
    assert(report.viewDir.contains("_m"), s"view not versioned: ${report.viewDir}")
    // maintained view ≡ full recompute over the post-append store
    def key(r: org.apache.spark.sql.Row) =
      (r.getDate(0).toString, r.getString(1), r.getLong(2), r.getLong(3))
    val maintained = spark.read.parquet(report.viewDir)
      .select("day", "event_type", "n", "cents").collect().map(key).sortBy(t => (t._1, t._2))
    val full = MatViews.withoutRewrite {
      MatViews.naiveDailyRollup(spark, store).collect().map(key).sortBy(t => (t._1, t._2))
    }
    assert(maintained.toSeq == full.toSeq,
      "algebraic merge diverged from the full recompute")
    // the post-append query is answered from the MAINTAINED view dir
    val df = MatViews.naiveDailyRollup(spark, store)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains(new java.io.File(report.viewDir).getName),
      s"query not answered from the maintained view:\n$plan")
    assert(df.collect().map(key).sortBy(t => (t._1, t._2)).toSeq == full.toSeq)
    // no-op maintenance: nothing new, same view
    val again = MatViews.maintainDailyRollup(spark, store)
    assert(again.added == 0 && !again.restaged && again.viewDir == report.viewDir)
    // and the staleness gate alone (no maintenance) never serves stale:
    // append once more and query WITHOUT maintaining
    ev.filter(pmod(col("event_id"), lit(10)) === 7)
      .withColumn("event_id", col("event_id") + 1000000000L)
      .write.mode("append").parquet(s"$store/events.parquet")
    val pre = MatViews.naiveDailyRollup(spark, store)
    assert(!pre.queryExecution.executedPlan.toString
      .contains(new java.io.File(report.viewDir).getName),
      "stale maintained view served after an unmaintained append")
  }

  test("cat7: incremental maintenance refreshes the template — exact match fires post-append") {
    import org.apache.spark.sql.functions._
    val store = graft.Tables.scratchDir("graft_cat7tmpl", sf0001)
    val ev = graft.Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    ev.filter(pmod(col("event_id"), lit(10)) =!= 3)
      .write.mode("overwrite").parquet(s"$store/events.parquet")
    MatViews.stageDailyRollup(spark, store)
    ev.filter(pmod(col("event_id"), lit(10)) === 3)
      .write.mode("append").parquet(s"$store/events.parquet")
    val report = MatViews.maintainDailyRollup(spark, store)
    assert(!report.restaged)
    // the re-registered entry's template is derived from the POST-append
    // store, so the exact tier (cat3) answers with a plain projection —
    // no Aggregate survives in the plan (a stale template would force
    // the roll-up compensation path on every matching query)
    val df = MatViews.naiveDailyRollup(spark, store)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains(new java.io.File(report.viewDir).getName),
      s"not answered from the maintained view:\n$plan")
    assert(!plan.contains("HashAggregate"),
      s"exact swap should be a plain projection post-maintenance:\n$plan")
  }

  test("cat10: a fact append maintains the star view in delta cost; a dim change forces re-stage") {
    import org.apache.spark.sql.functions._
    val store = graft.Tables.scratchDir("graft_cat10spec", sf0001)
    val ev = graft.Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    ev.filter(pmod(col("event_id"), lit(10)) =!= 4)
      .write.mode("overwrite").parquet(s"$store/events.parquet")
    graft.Tables.customer(spark, sf0001).select("c_custkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$store/customer.parquet")
    MatViews.stageStarRollup(spark, store)
    ev.filter(pmod(col("event_id"), lit(10)) === 4)
      .write.mode("append").parquet(s"$store/events.parquet")
    val report = MatViews.maintainStarRollup(spark, store)
    assert(!report.restaged, "fact append was answered by a full re-stage")
    assert(report.added > 0 && report.removed == 0)
    // maintained view ≡ full recompute over the post-append store
    def key(r: org.apache.spark.sql.Row) = (r.getDate(0).toString,
      r.getString(1), r.getString(2), r.getLong(3), r.getLong(4))
    val maintained = spark.read.parquet(report.viewDir)
      .select("day", "event_type", "c_mktsegment", "n", "cents")
      .collect().map(key).sortBy(t => (t._1, t._2, t._3))
    val full = MatViews.withoutRewrite {
      MatViews.naiveStarRollup(spark, store)
        .collect().map(key).sortBy(t => (t._1, t._2, t._3))
    }
    assert(maintained.toSeq == full.toSeq,
      "star algebraic merge diverged from the full recompute")
    // the post-append star query answers from the MAINTAINED view
    val df = MatViews.naiveStarRollup(spark, store)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains(new java.io.File(report.viewDir).getName),
      s"query not answered from the maintained star view:\n$plan")
    assert(!plan.contains("events.parquet") && !plan.contains("customer.parquet"),
      s"maintained-star plan still reads a base table:\n$plan")
    // no-op maintenance: same view back
    val again = MatViews.maintainStarRollup(spark, store)
    assert(again.added == 0 && !again.restaged && again.viewDir == report.viewDir)
    // a DIM change can never take the algebraic path
    graft.Tables.customer(spark, sf0001)
      .select("c_custkey", "c_mktsegment")
      .withColumn("c_mktsegment", upper(col("c_mktsegment")))
      .write.mode("overwrite").parquet(s"$store/customer.parquet")
    val dimReport = MatViews.maintainStarRollup(spark, store)
    assert(dimReport.restaged, "dim change must force a full re-stage")
  }

  test("cat7: an in-place file rewrite under the same name forces a full re-stage") {
    import org.apache.spark.sql.functions._
    val store = graft.Tables.scratchDir("graft_cat7inplace", sf0001)
    val ev = graft.Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    ev.repartition(4).write.mode("overwrite").parquet(s"$store/events.parquet")
    MatViews.stageDailyRollup(spark, store)
    val tableDir = new java.io.File(s"$store/events.parquet")
    val parts = tableDir.listFiles().filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(parts.length >= 2, "need at least two part files to swap contents")
    // rewrite part 0 IN PLACE with part 1's bytes (same name, different
    // content) and ALSO append new files — a name-set diff alone would
    // classify this batch as a pure append and merge a wrong view
    java.nio.file.Files.copy(parts(1).toPath, parts(0).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // keep the local-FS checksum sidecar consistent with the new bytes
    // (a real FS rewrite goes through Hadoop and maintains its own crc)
    java.nio.file.Files.copy(
      new java.io.File(tableDir, s".${parts(1).getName}.crc").toPath,
      new java.io.File(tableDir, s".${parts(0).getName}.crc").toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ev.filter(pmod(col("event_id"), lit(7)) === 0)
      .withColumn("event_id", col("event_id") + 2000000000L)
      .write.mode("append").parquet(s"$store/events.parquet")
    val report = MatViews.maintainDailyRollup(spark, store)
    assert(report.restaged,
      "in-place rewrite + append must force a full re-stage, not an algebraic merge")
    // the re-staged view equals the full recompute over the mutated store
    def key(r: org.apache.spark.sql.Row) =
      (r.getDate(0).toString, r.getString(1), r.getLong(2), r.getLong(3))
    val maintained = spark.read.parquet(report.viewDir)
      .select("day", "event_type", "n", "cents").collect().map(key).sortBy(t => (t._1, t._2))
    val full = MatViews.withoutRewrite {
      MatViews.naiveDailyRollup(spark, store).collect().map(key).sortBy(t => (t._1, t._2))
    }
    assert(maintained.toSeq == full.toSeq)
  }

  test("cat6 join-aware: the star aggregate reads ONLY the view and equals the raw join") {
    val df = graft.engine.GraftCatalog.mvJoinRewrite(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_mv_star"),
      s"join-aware rewrite did not fire:\n$plan")
    assert(!plan.contains("events.parquet") && !plan.contains("customer.parquet"),
      s"rewritten plan still reads a base table:\n$plan")
    val expected = MatViews.withoutRewrite {
      graft.engine.GraftCatalog.mvJoinRewrite(spark, sf0001).collect()
    }
    assert(expected.nonEmpty)
    assert(df.collect().toSeq == expected.toSeq,
      "view-backed star answer diverges from the raw join")
  }

  test("cat6 join-aware: derivable filters compensate; foreign shapes stay on base tables") {
    MatViews.stageStarRollup(spark, sf0001)
    import org.apache.spark.sql.functions._
    def star = graft.Tables.events(spark, sf0001)
      .join(graft.Tables.customer(spark, sf0001),
        col("user_id") === col("c_custkey"))
    // a key-derivable filter (event_type) compensates onto the view scan
    val filtered = star.filter(col("event_type") === "click")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
    val fplan = filtered.queryExecution.executedPlan.toString
    assert(fplan.contains("graft_mv_star") && !fplan.contains("events.parquet"),
      s"derivable filter should compensate:\n$fplan")
    val fexp = MatViews.withoutRewrite { filtered.collect() }
    assert(filtered.collect().sortBy(_.getString(0)).toSeq ==
      fexp.sortBy(_.getString(0)).toSeq)
    // a DIFFERENT join condition is not the view's join — left alone
    val wrongJoin = graft.Tables.events(spark, sf0001)
      .join(graft.Tables.customer(spark, sf0001),
        col("user_id") === col("c_nationkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
    assert(!wrongJoin.queryExecution.executedPlan.toString.contains("graft_mv_star"),
      "rewrite fired on a different join condition")
    // a value predicate is not derivable from the view keys — left alone
    val valueFilter = star.filter(col("value") > 5.0)
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
    assert(!valueFilter.queryExecution.executedPlan.toString.contains("graft_mv_star"),
      "rewrite fired under a raw-column predicate")
    // a non-algebraic aggregate cannot re-aggregate from the partials
    val avgAgg = star.groupBy(col("c_mktsegment")).agg(avg(col("value")).as("v"))
    assert(!avgAgg.queryExecution.executedPlan.toString.contains("graft_mv_star"),
      "rewrite fired on a non-compensatable aggregate")
    // a coarser-than-segment cut — the GLOBAL total over the join
    val global = star.agg(count(lit(1)).as("n"))
    val gplan = global.queryExecution.executedPlan.toString
    assert(gplan.contains("graft_mv_star") && !gplan.contains("events.parquet"),
      s"global count over the join should compensate:\n$gplan")
    val gexp = MatViews.withoutRewrite { global.head().getLong(0) }
    assert(global.head().getLong(0) == gexp)
  }

  test("cat8: with both views registered, a month query reads the CHEAPER monthly view; a day query still reads the daily") {
    import org.apache.spark.sql.functions._
    MatViews.stageDailyRollup(spark, sf0001)
    MatViews.stageMonthlyRollup(spark, sf0001)
    // the cost order is real: the monthly view stores fewer rows
    val src = MatViews.canonicalSrc(sf0001)
    val daily = MatViews.registry.get(src)
    val monthly = MatViews.coarseRegistry.get(src)
    assert(monthly.rows > 0 && monthly.rows < daily.rows,
      s"cost order broken: monthly=${monthly.rows} daily=${daily.rows}")
    // a month-level query matches BOTH (monthly directly, daily via
    // roll-up compensation) — the chooser must take the monthly view
    val df = graft.engine.GraftCatalog.mvCheapestView(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_mv_monthly"),
      s"chooser did not pick the monthly view:\n$plan")
    assert(!plan.contains("graft_mv_daily") && !plan.contains("events.parquet"),
      s"chooser read a more expensive source:\n$plan")
    val expected = MatViews.withoutRewrite {
      graft.engine.GraftCatalog.mvCheapestView(spark, sf0001).collect()
    }
    assert(expected.nonEmpty)
    assert(df.collect().toSeq == expected.toSeq,
      "cheapest-view answer diverges from the raw aggregation")
    // a DAY-level query is underivable from the monthly key: the chooser
    // tries monthly first (cheaper), fails the key-closure test, and
    // falls through to the daily view
    val dayQ = graft.Tables.events(spark, sf0001)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val dplan = dayQ.queryExecution.executedPlan.toString
    assert(dplan.contains("graft_mv_daily") && !dplan.contains("graft_mv_monthly"),
      s"day query mis-routed:\n$dplan")
    val dexp = MatViews.withoutRewrite { dayQ.collect() }
    assert(dayQ.collect().sortBy(_.getDate(0).toString).toSeq ==
      dexp.sortBy(_.getDate(0).toString).toSeq)
  }

  // AQE-aware scan lookup (SourcesSpec.fileScans is the template)
  private def fileScans(df: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p.collect {
        case f: FileSourceScanExec => Seq(f)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: QueryStageExec => scans(q.plan)
      }.flatten
    scans(df.queryExecution.executedPlan)
  }

  private def probeDay(d: String): java.sql.Date = {
    import org.apache.spark.sql.functions._
    MatViews.withoutRewrite {
      graft.Tables.events(spark, d)
        .agg(date_add(min(to_date(col("ts"))), 3).as("d")).head.getDate(0)
    }
  }

  test("cat9: lowered to_date bounds recover day predicates — equality and range compensate onto the flat view") {
    import org.apache.spark.sql.functions._
    MatViews.partRegistry.clear() // flat daily view only
    MatViews.stageDailyRollup(spark, sf0001)
    val d0 = probeDay(sf0001)
    // Spark lowers to_date(ts) = d0 to isnotnull(ts) AND ts >= midnight
    // AND ts < midnight+1d before injected rules run; the matcher must
    // recover the day predicate from that form or never fire on ANY
    // day-selective query
    val q = graft.Tables.events(spark, sf0001)
      .filter(to_date(col("ts")) === lit(d0))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(round(value * 100) as bigint)")).as("cents"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("graft_mv_daily") && !plan.contains("events.parquet"),
      s"day-equality compensation did not fire:\n$plan")
    val exp = MatViews.withoutRewrite { q.collect() }
    assert(exp.nonEmpty, "probe day selected no events — fixture drifted")
    assert(q.collect().sortBy(_.getString(0)).toSeq ==
      exp.sortBy(_.getString(0)).toSeq)
    // a midnight-aligned RANGE recovers too (>= lower, < upper+1d)
    val r = graft.Tables.events(spark, sf0001)
      .filter(to_date(col("ts")).between(lit(d0), date_add(lit(d0), 2)))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val rplan = r.queryExecution.executedPlan.toString
    assert(rplan.contains("graft_mv_daily") && !rplan.contains("events.parquet"),
      s"day-range compensation did not fire:\n$rplan")
    val rexp = MatViews.withoutRewrite { r.collect() }
    assert(r.collect().sortBy(_.getString(0)).toSeq ==
      rexp.sortBy(_.getString(0)).toSeq)
    // a NON-midnight bound cuts within a day: must stay on the fact table
    val mid = new java.sql.Timestamp(d0.getTime + 6L * 3600 * 1000)
    val bad = graft.Tables.events(spark, sf0001)
      .filter(col("ts") >= lit(mid))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val bplan = bad.queryExecution.executedPlan.toString
    assert(bplan.contains("events.parquet"),
      s"non-midnight bound wrongly compensated:\n$bplan")
  }

  test("cat12: count-distinct answers from the distinct-keys view; multiplicity-needing aggregates stay raw") {
    import org.apache.spark.sql.functions._
    MatViews.stageDistinctUsers(spark, sf0001)
    val df = graft.engine.GraftCatalog.mvDistinctRewrite(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_mv_distinct") && !plan.contains("events.parquet"),
      s"distinct rewrite did not fire:\n$plan")
    val exp = MatViews.withoutRewrite {
      graft.engine.GraftCatalog.mvDistinctRewrite(spark, sf0001).collect()
    }
    assert(exp.nonEmpty)
    assert(df.collect().toSeq == exp.toSeq,
      "view-backed distinct count diverges from raw")
    // composes with the derivable-filter machinery: a day-selective
    // distinct count still reads only the view
    val d0 = probeDay(sf0001)
    val sel = graft.Tables.events(spark, sf0001)
      .filter(to_date(col("ts")) === lit(d0))
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("au"))
    val splan = sel.queryExecution.executedPlan.toString
    assert(splan.contains("graft_mv_distinct") && !splan.contains("events.parquet"),
      s"filtered distinct count did not compensate:\n$splan")
    val sexp = MatViews.withoutRewrite { sel.collect() }
    assert(sel.collect().sortBy(_.getString(0)).toSeq ==
      sexp.sortBy(_.getString(0)).toSeq)
    // a query that ALSO needs multiplicity can be served by NEITHER the
    // deduped view (count(*) lost) nor the summary views (distinct not
    // algebraic): it must stay on the fact table
    val mixed = graft.Tables.events(spark, sf0001)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("dau"))
    val mplan = mixed.queryExecution.executedPlan.toString
    assert(mplan.contains("events.parquet"),
      s"mixed multiplicity+distinct query wrongly rewritten:\n$mplan")
    // distinct over a NON-key column is underivable from this view
    val other = graft.Tables.events(spark, sf0001)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(countDistinct(col("value")).as("dv"))
    val oplan = other.queryExecution.executedPlan.toString
    assert(oplan.contains("events.parquet"),
      s"foreign distinct key wrongly rewritten:\n$oplan")
  }

  test("cat9: stats-driven choice — identical row counts, the day-selective query reads the PARTITIONED view pruned to one day") {
    import org.apache.spark.sql.functions._
    MatViews.stageDailyRollup(spark, sf0001)
    MatViews.stagePartitionedDailyRollup(spark, sf0001)
    val src = MatViews.canonicalSrc(sf0001)
    val flat = MatViews.registry.get(src)
    val part = MatViews.partRegistry.get(src)
    // the premise: row-count ordering CANNOT rank these two
    assert(flat.rows == part.rows && part.rows > 0,
      s"views should tie on rows: flat=${flat.rows} part=${part.rows}")
    assert(part.partitionCol.contains("day") && part.keyNdv > 1,
      s"partitioned entry missing stats: $part")
    val df = graft.engine.GraftCatalog.mvStatsChoice(spark, sf0001)
    val rows = df.collect() // execute THIS plan so scan metrics fill
    assert(rows.nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    val flatName = new java.io.File(
      graft.Tables.scratchDir("graft_mv_daily", sf0001)).getName
    assert(plan.contains("graft_mv_daily_part"),
      s"stats chooser did not pick the partitioned view:\n$plan")
    assert(!plan.contains(flatName) && !plan.contains("events.parquet"),
      s"chooser read a source it should have priced out:\n$plan")
    // partition pruning is REAL: the scan read exactly the probe-day
    // directory's files, a strict subset of the store
    val partDir = graft.Tables.scratchDir("graft_mv_daily_part", sf0001)
    val d0 = probeDay(sf0001)
    def parquets(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(parquets)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Seq.empty
    val dayFiles = parquets(new java.io.File(s"$partDir/day=$d0")).size
    val allFiles = parquets(new java.io.File(partDir)).size
    val scanned = fileScans(df).head.metrics("numFiles").value
    assert(scanned == dayFiles && dayFiles < allFiles,
      s"scan read $scanned files; day dir has $dayFiles of $allFiles")
    // and the answer is still exactly the raw aggregation
    val expected = MatViews.withoutRewrite {
      graft.engine.GraftCatalog.mvStatsChoice(spark, sf0001).collect()
    }
    assert(df.collect().toSeq == expected.toSeq,
      "stats-chosen answer diverges from the raw aggregation")
  }
}
