package graft.ops

import graft.SparkSpec

/** Physical-plan regression pins: the plans the engine is DESIGNED to
  * produce, asserted so a refactor that silently degrades them (lost
  * pushdown, an extra shuffle, a broadcast that became a sort-merge)
  * fails a spec instead of only showing up at 100 TB.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.executedPlan.toString

  test("star join: fact table never shuffles — all dims broadcast") {
    val p = plan("j2_star_revenue")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"),
      s"star join degraded to sort-merge (fact-side shuffle):\n$p")
  }

  test("TPC-H Q1: shipdate filter reaches the parquet scan") {
    val p = plan("a1_tpch_q1")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed to scan:\n$p")
  }

  test("narrow text ops: no shuffle before the final sort") {
    // t1/t2/t3 are pure projections over the scan; the only exchange is
    // the output orderBy's range partitioning
    for (q <- Seq("t1_token_counts", "t2_quality_score", "t3_lang_id")) {
      val p = plan(q)
      val exchanges = "(?m)^\\s*\\+?-? ?Exchange".r.findAllIn(p).size
      assert(p.count(_ == '\n') > 0 && "Exchange rangepartitioning".r.findAllIn(p).size <= 1)
      assert(!p.contains("Exchange hashpartitioning"),
        s"$q grew an aggregation shuffle:\n$p")
      assert(exchanges <= 1, s"$q has $exchanges exchanges:\n$p")
    }
  }

  test("contamination: benchmark side broadcasts into a semi join") {
    val p = plan("t9_contamination")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"t9 lost the broadcast semi join:\n$p")
  }

  test("funnel: windows and per-user collapse share one data shuffle") {
    val p = plan("e3_funnel")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    // one user_id exchange; the final single-row rollup is SinglePartition
    assert(exchanges == 1, s"funnel grew extra shuffles ($exchanges):\n$p")
  }

  test("serving top-k ranks via bounded aggregate, not a window") {
    // als_recommend scores batch × |items|; a Window would shuffle and
    // sort every scored row — the TopK Aggregator form shuffles O(k·batch)
    val p = plan("als_recommend")
    assert(p.contains("ObjectHashAggregate"),
      s"als_recommend lost the bounded TopK aggregate:\n$p")
    assert(!p.contains("Window"),
      s"als_recommend ranks through a full-sort window again:\n$p")
  }

  test("lateral top-k decorrelates to a window rank, not a per-row re-scan") {
    val p = plan("q2_lateral_topk")
    // Catalyst rewrites the correlated LIMIT subquery into a rank over
    // one partitioned window — no nested-loop / cartesian re-scan
    assert(p.contains("Window"), s"lateral did not decorrelate to a window:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"lateral fell back to a cartesian:\n$p")
  }

  test("partition pruning: src2 scan reads one partition") {
    val p = plan("src2_partitioned_pruning")
    assert("PartitionFilters: \\[[^\\]]*o_orderpriority".r.findFirstIn(p).isDefined,
      s"no partition filter on the pruned scan:\n$p")
  }

  test("EXISTS/NOT EXISTS decorrelate to hash joins, not per-row re-scans") {
    val p = plan("q4_exists_split")
    // Catalyst rewrites both correlated predicates into existence/semi
    // join machinery on the correlation key — one hash join pair, no
    // nested-loop re-scan of lineitem per supplier
    assert(p.contains("ExistenceJoin") || p.contains("LeftSemi") || p.contains("LeftAnti"),
      s"EXISTS did not decorrelate to a join:\n$p")
    assert(!p.contains("CartesianProduct"), s"EXISTS fell back to a cartesian:\n$p")
  }

  test("pareto cumulative: no single-task window or global sort in the plan") {
    // the customer-sized rollup must never funnel through one task: the
    // only Window is partitioned by the range-partition id, and no
    // global Sort exists (the two-pass cumulative replaces both)
    val df = graft.SparkEntry.queries("e11_revenue_pareto")(spark, sf0001)
    val phys = df.queryExecution.sparkPlan
    val wins = phys.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty, "expected the partition-local running-sum window")
    wins.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"unpartitioned (single-task) window reappeared:\n$w")
    }
    val globalSorts = phys.collect {
      case s0: org.apache.spark.sql.execution.SortExec if s0.global => s0
    }
    assert(globalSorts.isEmpty,
      s"global sort funnels the rollup through one ordering:\n${globalSorts.mkString}")
  }

  test("zipf rank: no single-task window or global sort over the vocabulary") {
    // t21's rank runs through Cumulative.globalRowNumber: a web-scale
    // vocabulary is 10^6-10^7 rows, so even the rollup must never funnel
    // through one ordering task
    val df = graft.SparkEntry.queries("t21_zipf_fit")(spark, sf0001)
    val phys = df.queryExecution.sparkPlan
    val wins = phys.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty, "expected the partition-local running-count window")
    wins.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"unpartitioned (single-task) window reappeared:\n$w")
    }
    val globalSorts = phys.collect {
      case s0: org.apache.spark.sql.execution.SortExec if s0.global => s0
    }
    assert(globalSorts.isEmpty,
      s"global sort funnels the vocabulary through one ordering:\n${globalSorts.mkString}")
  }

  test("weighted percentiles: no single-task window or global sort over the price domain") {
    // a22's cumulative weight runs through Cumulative.runningTotal: the
    // distinct-cents rollup is data-sized (one row per distinct price),
    // so the ordering must stay partition-parallel
    val df = graft.SparkEntry.queries("a22_weighted_percentiles")(spark, sf0001)
    val phys = df.queryExecution.sparkPlan
    val wins = phys.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty, "expected the partition-local running-sum window")
    wins.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"unpartitioned (single-task) window reappeared:\n$w")
    }
    // the only permissible global sort is the |qpcts|-row presentation
    // ORDER BY — never one over the cents domain
    val globalSorts = phys.collect {
      case s0: org.apache.spark.sql.execution.SortExec if s0.global => s0
    }
    globalSorts.foreach { s0 =>
      val keys = s0.sortOrder.map(_.child.toString).mkString(",")
      assert(keys.contains("qpct") && !keys.contains("cents"),
        s"global sort funnels the price domain through one ordering:\n$s0")
    }
  }

  test("recursive hierarchy: the plan recurses via UnionLoop, not an unrolled union") {
    // q5 must exercise Spark 4's native recursive-CTE operator — a
    // manually unrolled union would silently cap the depth
    val df = graft.SparkEntry.queries("q5_recursive_hierarchy")(spark, sf0001)
    val p = df.queryExecution.optimizedPlan.toString
    assert(p.contains("UnionLoop"), s"no UnionLoop in the optimized plan:\n$p")
  }

  test("quantile sketch: one events scan — the weekly merge reuses the daily cube") {
    // the sketch-cube contract: raw events are binned ONCE; every
    // coarser rollup merges bucket counts, it never re-reads the facts
    val df = graft.SparkEntry.queries("a18_quantile_sketch")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    val scans = "events\\.parquet".r.findAllMatchIn(plan).size
    assert(scans == 1, s"expected exactly 1 events scan, found $scans:\n$plan")
  }

  test("multimodal decode chains: scan-speed narrow — no aggregation shuffle anywhere") {
    // m8 (decode→resize→encode→decode) and m9 (frame sampling) are pure
    // per-row transforms; the only exchange either may carry is the
    // output orderBy's range partitioning
    for (q <- Seq("m8_resize", "m9_frame_sample")) {
      val p = plan(q)
      assert(!p.contains("Exchange hashpartitioning"),
        s"$q grew an aggregation/join shuffle:\n$p")
      val exchanges = "Exchange".r.findAllIn(p).size
      assert(exchanges <= 1, s"$q has $exchanges exchanges:\n$p")
    }
  }

  test("audio VAD: scan-speed narrow — decode/frame/trim all inside the row") {
    val p = plan("m10_audio_vad")
    assert(!p.contains("Exchange hashpartitioning"),
      s"m10 grew an aggregation/join shuffle:\n$p")
    assert("Exchange".r.findAllIn(p).size <= 1, s"m10 extra exchanges:\n$p")
  }

  test("CIDR rollup: the block table broadcasts — the event stream never sorts for the join") {
    val p = plan("f14_ip_cidr")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"f14 lost the broadcast block join:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"f14 block join degraded to a data-sized shuffle:\n$p")
  }

  test("A/B readout: one (user, day) aggregation pass is the only data-sized shuffle") {
    val p = plan("e20_ab_test")
    // the unit agg shuffles on (user_id, day); everything after is a
    // 1-row rollup (SinglePartition) — no joins, no windows
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"),
      s"e20 grew a join or window:\n$p")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx <= 1, s"e20 has $hashEx hash exchanges:\n$p")
  }

  test("preference pairs: both rank windows run map-side group limits before the shuffle") {
    val p = plan("p20_preference_pairs")
    // the row_number <= K filters must materialize as WindowGroupLimit
    // (partial mode ships K rows per input partition per stratum —
    // never a full per-source sort of the corpus); the count join
    // stays broadcast
    val limits = "WindowGroupLimit".r.findAllIn(p).size
    assert(limits >= 2, s"p20 lost its window group limits ($limits):\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"p20 count-refinement join lost its broadcast:\n$p")
  }

  test("leakage split: shuffle keys are digests, two aggs, no window or join") {
    val p = plan("p21_leakage_split")
    assert(!p.contains("Window") && !p.contains("Join"),
      s"p21 grew a window or join:\n$p")
    // the digest is projected below the partial agg, so the group
    // shuffle keys on _groupingexpression (the md5), never raw text
    assert(p.contains("md5(cast(text") &&
      "Exchange hashpartitioning\\(_groupingexpression".r.findAllIn(p).nonEmpty,
      s"p21's group shuffle should key on the md5 digest, not text:\n$p")
  }

  test("crawl corpus (p22): dedup window keys on the md5 digest, never raw text") {
    val p = plan("p22_crawl_corpus")
    // the exact-dedup rank partitions by md5(text): the window exchange
    // must hash on the projected digest (p21's discipline) — shuffling
    // raw documents to dedup them is the classic 100 TB mistake
    assert(p.contains("md5(cast(text"),
      s"p22 lost its digest projection:\n$p")
    assert(!"Exchange hashpartitioning\\(text".r.findAllIn(p).hasNext,
      s"p22 shuffles raw text:\n$p")
  }

  test("mv roll-up (cat4/cat5): compensated plans aggregate the view, zero fact-table IO") {
    graft.plans.MatViews.stageDailyRollup(spark, sf0001)
    val p4 = plan("cat4_mv_rollup")
    assert(p4.contains("graft_mv_") && !p4.contains("events.parquet"),
      s"cat4 plan still touches the fact table:\n$p4")
    val p5 = plan("cat5_mv_filter")
    assert(p5.contains("graft_mv_") && !p5.contains("events.parquet"),
      s"cat5 plan still touches the fact table:\n$p5")
  }

  test("skew-salted join (j15): salting spreads the hot key's mass ≥ 8× thinner") {
    import org.apache.spark.sql.functions._
    val S = 16
    val fact = graft.Tables.events(spark, sf0001).select(
      when(pmod(col("user_id"), lit(3)) =!= 0, lit(0L))
        .otherwise(col("user_id")).as("uid"),
      col("event_id"))
    val total = fact.count()
    // the skew is real: the hot key owns more than half the fact
    val byKey = fact.groupBy("uid").agg(count(lit(1)).as("n"))
    val hotN = byKey.orderBy(desc("n")).first().getLong(1)
    assert(hotN > total / 2, s"fixture skew too weak: $hotN of $total")
    // after salting, the largest (uid, salt) cell holds ≤ hot/8 — the
    // shuffle's max task is bounded by the CELL, so the straggler is gone
    val maxCell = fact
      .withColumn("salt", pmod(xxhash64(col("event_id")), lit(S)))
      .groupBy("uid", "salt").agg(count(lit(1)).as("n"))
      .orderBy(desc("n")).first().getLong(2)
    assert(maxCell <= hotN / 8,
      s"salting left a cell of $maxCell rows (hot key holds $hotN)")
    // the declared rollup is salt-independent: replay as a plain join
    val dim = fact.select("uid").distinct()
      .withColumn("segment", pmod(col("uid"), lit(5)))
    val plain = graft.Tables.events(spark, sf0001).select(
        when(pmod(col("user_id"), lit(3)) =!= 0, lit(0L))
          .otherwise(col("user_id")).as("uid"), col("value"))
      .join(dim, Seq("uid"))
      .groupBy("segment")
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .orderBy("segment").collect().toSeq
    val salted = graft.ops.Relational.skewSaltedJoin(spark, sf0001)
      .collect().toSeq
    assert(salted == plain, "salted join result diverges from the plain join")
  }

  test("day-over-day (a24): the self-joined rollup reuses one exchange — events scanned once") {
    // pin the reuse shape with the MV rewrite suppressed: when a daily
    // view happens to be registered (other tests in this suite register
    // one), the rule answers BOTH join sides from the calendar-sized
    // view — an even better plan, but a different one than this pin
    val p = graft.plans.MatViews.withoutRewrite {
      val df = graft.SparkEntry.queries("a24_day_over_day")(spark, sf0001)
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    assert(p.contains("ReusedExchange"),
      s"self-join recomputed the rollup instead of reusing the exchange:\n$p")
    // count scans in the FINAL adaptive plan only (the string also
    // renders the pre-reuse Initial Plan section)
    val finalSection = p.split("== Initial Plan ==").head
    val scans = "FileScan parquet".r.findAllIn(finalSection).size
    assert(scans == 1, s"events scanned $scans times (expected 1):\n$p")
  }

  test("AQE skew join (j17): the hot partition splits at runtime — SMJ marked skew=true") {
    import org.apache.spark.sql.functions._
    val df = graft.ops.Relational.aqeSkewJoin(spark, sf0001)
    val rows = df.collect() // AQE decides after the shuffle runs
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("skew=true"),
      s"AQE did not split the skewed partition:\n$p")
    // split-and-reread must not change a single row: replay plainly
    val plain = graft.Tables.events(spark, sf0001).select(
        when(pmod(col("user_id"), lit(3)) =!= 0, lit(0L))
          .otherwise(col("user_id")).as("uid"), col("value"))
    val dim = graft.Tables.customer(spark, sf0001)
      .select(col("c_custkey").as("uid"),
        pmod(col("c_custkey"), lit(5)).as("segment"))
    val expected = plain.join(dim, Seq("uid"))
      .groupBy("segment")
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .orderBy("segment").collect()
    assert(rows.toSeq == expected.toSeq)
  }

  test("runtime bloom join (j16): might_contain filters the probe side before the shuffle") {
    val df = graft.ops.Relational.runtimeBloomJoin(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"),
      s"no runtime bloom filter on the probe side:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"runtime filters only apply to shuffle joins:\n$p")
    // the injected filter must sit on the LINEITEM (probe) scan branch
    assert("might_contain[\\s\\S]{0,2000}lineitem".r.findFirstIn(p).isDefined ||
      "lineitem[\\s\\S]{0,2000}might_contain".r.findFirstIn(p).isDefined,
      s"might_contain not adjacent to the probe scan:\n$p")
    // and the result equals the plain broadcast-join form
    import org.apache.spark.sql.functions._
    val plain = graft.Tables.lineitem(spark, sf0001)
      .join(graft.Tables.orders(spark, sf0001)
        .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy("l_returnflag").collect().toSeq
    assert(df.collect().toSeq == plain)
  }
}
