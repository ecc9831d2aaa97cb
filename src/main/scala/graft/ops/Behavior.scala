package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** User-behavior analytics over the events stream: cohort retention and
  * session-interval overlap — the two queries every product-analytics
  * workload runs that do NOT reduce to a single groupBy.
  *
  * Scale thread: every derived table here keys on user_id, so the
  * window pass, the first-day agg, and the join back all reuse ONE
  * hash partitioning; the interval join replaces the quadratic range
  * predicate with bin-local equi-joins.
  */
object Behavior {
  import Tables._

  /** e23 — MARKOV REMOVAL-EFFECT ATTRIBUTION (Anderl et al. 2014 — the
    * model-based complement to e6's rule-based last-touch/position
    * credit): user-day event paths, truncated at the first purchase,
    * define an absorbing Markov chain (START → channels → CONV/NULL);
    * a channel's credit is its REMOVAL EFFECT — how much the chain's
    * conversion probability drops when every path through that channel
    * is failed — normalized into attribution shares. Removal is
    * value-zeroing: P(conv) is the absorbing-chain hitting probability
    * computed by 50 value-iteration steps, and a removed channel's
    * state value is pinned to 0, which is exactly "transitions into it
    * go to NULL".
    *
    * Scale split: the DISTRIBUTED work is path construction and the
    * (src, dst) transition count — two window passes and one
    * aggregation, all hash-partitioned on (user_id, day); the chain
    * solve is a ≤|channels+3|² LUT collected to the driver (the
    * sample-sized-fit discipline: never an MLlib job for a 7×7
    * matrix). Each iteration rounds to 12 dp — g1 PageRank's
    * per-iteration rounding, which makes the fp fixed point identical
    * across engines regardless of summation order — so the DuckDB
    * recursive-CTE replay hash-matches exactly.
    */
  def markovAttribution(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    val seq0 = events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("ts"),
        col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(w))
    val firstPurch = seq0.filter(col("event_type") === "purchase")
      .groupBy("user_id", "day").agg(min("rn").as("conv_rn"))
    val path = seq0.join(firstPurch, Seq("user_id", "day"), "left")
      .filter(col("conv_rn").isNull || col("rn") <= col("conv_rn"))
      .withColumn("state", when(col("event_type") === "purchase", lit("CONV"))
        .otherwise(col("event_type")))
    val trans = path
      .withColumn("src", coalesce(lag("state", 1).over(w), lit("START")))
      .select(col("src"), col("state").as("dst"))
    val ends = path
      .withColumn("mx", max("rn").over(Window.partitionBy("user_id", "day")))
      .filter(col("rn") === col("mx") && col("state") =!= "CONV")
      .select(col("state").as("src"), lit("NULL").as("dst"))
    // the transition LUT: ≤ (|channels|+3)² rows — bounded by the event
    // vocabulary, never the data
    val counts = trans.unionByName(ends)
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val totals = counts.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val t: Map[String, Seq[(String, Double)]] = counts
      .groupBy(_._1).view.mapValues(_.toSeq.sortBy(_._2)
        .map { case (src, dst, n) => (dst, n.toDouble / totals(src)) }).toMap
    val states = t.keys.toSeq.sorted
    def r12(v: Double): Double =
      BigDecimal(v).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    def pConv(removed: String): Double = {
      var cur = states.map(_ -> 0.0).toMap
      for (_ <- 1 to 50) {
        cur = states.map { st =>
          val v = t(st).map { case (dst, pr) =>
            pr * (dst match {
              case "CONV" => 1.0
              case "NULL" => 0.0
              case `removed` => 0.0
              case other => cur.getOrElse(other, 0.0)
            })
          }.sum
          st -> r12(v)
        }.toMap
      }
      cur("START")
    }
    val base = pConv(removed = "")
    val channels = states.filterNot(Set("START", "CONV", "NULL")).sorted
    val res = channels.map(c => (c, 1.0 - pConv(c) / base))
    val total = res.map(_._2).sum
    res.map { case (c, re) =>
      (c, BigDecimal(re).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(re / total).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toDF("channel", "removal_effect", "attribution")
      .orderBy("channel")
  }

  /** e7 — weekly cohort retention matrix: users bucketed by first-seen
    * week, activity counted per (cohort, weeks-since) cell, reported as
    * a fraction of the cohort. Three aggregations, ONE logical key: the
    * per-user min, the join back, and the (user, week) dedup all hash on
    * user_id (AQE reuses the exchange); only the final tiny
    * (cohort, age) rollup reshuffles.
    */
  def cohortRetention(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("user_id"),
        floor(unix_date(to_date(col("ts"))) / 7).as("week"))
      .distinct()
    val cohort = ev.groupBy("user_id").agg(min("week").as("cohort_week"))
    val size = cohort.groupBy("cohort_week")
      .agg(count(lit(1)).as("n_cohort"))
    ev.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("age_weeks"))
      .agg(count(lit(1)).as("n_active"))
      .join(size, Seq("cohort_week"))
      .select(col("cohort_week"), col("age_weeks"), col("n_active"),
        round(col("n_active").cast("double") / col("n_cohort"), 6).as("retention"))
      .orderBy("cohort_week", "age_weeks")
  }

  /** Per-user session intervals (same ≥30-min-gap rule as e2, but kept
    * as [start, end] spans instead of per-user counts).
    */
  def sessionIntervals(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(s, d)
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("prev_ms", lag("ms", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ms").isNull || col("ms") - col("prev_ms") >= 1800000L, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum("new_session").over(byUser.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(min("ms").as("lo"), max("ms").as("hi"))
  }

  /** j10 — interval-overlap join, binned: which users were active at
    * overlapping times? Every session explodes to the hour bins it
    * covers (a narrow generator); candidate pairs meet in bin-local
    * equi-joins; the exact overlap predicate then filters and DISTINCT
    * removes multi-bin duplicates. This is the scalable range-join
    * shape: the quadratic interval×interval predicate becomes
    * |bins|-bounded local joins — the same reason d5 grids embeddings
    * and d4 inverts n-grams. Bin width trades explode factor against
    * join selectivity; sessions are hours-scale, so hour bins keep the
    * explode O(session length).
    */
  def intervalOverlapJoin(s: SparkSession, d: String,
      binMs: Long = 3600000L): DataFrame = {
    val sess = sessionIntervals(s, d).cache()
    val binned = sess.select(col("user_id"), col("lo"), col("hi"),
      explode(sequence(floor(col("lo") / binMs),
        floor(col("hi") / binMs))).as("bin"))
    val a = binned.select(col("bin"), col("user_id").as("u1"),
      col("lo").as("lo1"), col("hi").as("hi1"))
    val b = binned.select(col("bin"), col("user_id").as("u2"),
      col("lo").as("lo2"), col("hi").as("hi2"))
    a.join(b, Seq("bin"))
      .filter(col("u1") < col("u2") &&
        col("lo1") <= col("hi2") && col("lo2") <= col("hi1"))
      .select("u1", "lo1", "hi1", "u2", "lo2", "hi2").distinct()
      .groupBy("u1", "u2")
      .agg(count(lit(1)).as("n_overlapping_sessions"))
      .orderBy("u1", "u2")
  }

  private val sessionSql: String =
    """sessions AS (
      |  SELECT user_id, session_id, min(ms) AS lo, max(ms) AS hi FROM (
      |    SELECT user_id, ms,
      |      sum(new_session) OVER (PARTITION BY user_id ORDER BY ms, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |    FROM (
      |      SELECT user_id, event_id,
      |        epoch_ms(CAST(ts AS TIMESTAMP)) AS ms,
      |        CASE WHEN lag(epoch_ms(CAST(ts AS TIMESTAMP))) OVER
      |            (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |          OR epoch_ms(CAST(ts AS TIMESTAMP))
      |            - lag(epoch_ms(CAST(ts AS TIMESTAMP))) OVER
      |              (PARTITION BY user_id ORDER BY ts, event_id) >= 1800000
      |          THEN 1 ELSE 0 END AS new_session
      |      FROM events))
      |  GROUP BY 1, 2)""".stripMargin

  /** e8 — RFM (recency/frequency/monetary) quartile segmentation, the
    * classic customer-base cut. Scale shape: the per-customer rollup is
    * the only fact-table pass (dimension-sized output); the three
    * quartile boundaries are ONE [[Stats.quantileCuts]] agg over that
    * rollup, broadcast back as a 1-row literal, and scores are pure
    * comparisons against the cuts — deliberately NOT `ntile()`, whose
    * empty-over window would drag every customer onto a single task.
    * Exact `percentile` interpolates midpoints of integer/2dp-rounded
    * values, so both engines compute bit-identical cuts (the a6 pairing:
    * Spark `percentile` ↔ DuckDB `quantile_cont`); `money`'s cents
    * domain grows with the customer count, so above
    * [[Stats.DefaultExactDomainCap]] its cut alone degrades to the
    * mergeable sketch while the bounded-domain columns stay exact.
    * Output is the 4×4×4 segment grid with counts and revenue, not
    * per-customer rows.
    */
  def rfmSegments(s: SparkSession, d: String): DataFrame = {
    val cust = orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(
        datediff(max("o_orderdate"), lit("1992-01-01").cast("date"))
          .cast("double").as("last_day"),
        count(lit(1)).cast("double").as("freq"),
        round(sum("o_totalprice"), 2).as("money"))
      // r19 (guide §5): consumed by the cuts agg AND the scoring pass —
      // caching skips re-running the per-customer aggregation shuffle
      .cache()
    val qs = Seq(0.25, 0.5, 0.75)
    val cuts = Stats.quantileCuts(cust, Seq(
      Stats.CutSpec("rc", "last_day", qs),
      Stats.CutSpec("fc", "freq", qs),
      Stats.CutSpec("mc", "money", qs)))._1
    def score(v: Column, c: Column): Column =
      lit(1) + (v > element_at(c, 1)).cast("int") +
        (v > element_at(c, 2)).cast("int") + (v > element_at(c, 3)).cast("int")
    cust.crossJoin(broadcast(cuts))
      .select(
        score(col("last_day"), col("rc")).as("r"),
        score(col("freq"), col("fc")).as("f"),
        score(col("money"), col("mc")).as("m"),
        col("money"))
      .groupBy("r", "f", "m")
      .agg(count(lit(1)).as("n_cust"), round(sum("money"), 2).as("revenue"))
      .orderBy("r", "f", "m")
  }

  /** e9 — TIME-BOUNDED funnel (view → click within 1 h → purchase within
    * 24 h), the sequence-pattern semantics e3's unconstrained funnel
    * can't express (MATCH_RECOGNIZE territory). Expressed as a 2-step
    * instance of [[Funnel.boundedSequence]] — the general bounded-gap
    * fold over the custom as-of exec — so each step is one merge pass
    * per co-partition and the whole funnel costs two key-clustered
    * shuffles, never a per-purchase range explosion. Ties on equal
    * timestamps are safe: only the matched TIME enters the aggregates,
    * and ties share it. Oracle: DuckDB's native ASOF joins with the same
    * bounds — a second engine-level validation of the custom operator,
    * this time composed (e14 validates the 3-step fold).
    */
  def timeBoundFunnel(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("anchor_id"), col("user_id"), col("ts"))
    // the two hard-coded as-of hops, re-expressed as a 2-step instance
    // of the general bounded-gap sequence fold (e14 is the 3-step one)
    Funnel.boundedSequence(ev, purchases,
        Seq(("click", "24 HOURS"), ("view", "1 HOUR")))
      .select(col("step_0").as("n_purchases"),
        col("step_1").as("n_with_click"),
        col("step_2").as("n_full_chain"))
  }

  /** e13 — order-to-ship latency by order month: per line item, days
    * between the order date and its ship date, rolled up to monthly
    * count / mean / exact median — the fulfillment SLA trend. One join
    * (orders side is key+date only — column-pruned at the scan) and one
    * agg; the exact percentile is per-month (bounded groups), using the
    * a6 Spark-percentile ↔ DuckDB-quantile_cont pairing. Latencies are
    * integer days, so the median interpolates halves exactly on both
    * engines.
    */
  def shipLatency(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM").as("month"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("double").as("lat"))
      .groupBy("month")
      .agg(count(lit(1)).as("n_lines"),
        round(avg("lat"), 4).as("mean_days"),
        round(expr("percentile(lat, 0.5)"), 1).as("median_days"))
      .orderBy("month")

  /** e12 — new-vs-returning revenue split per month: each order is 'new'
    * iff it falls in its customer's FIRST month — the health metric
    * separating acquisition from retention revenue. Same first-appearance
    * trick as a15: one per-customer min-month agg joins back to the fact
    * table, so no per-order window and no second fact pass. The join is
    * deliberately UN-hinted: firstMonth has one row per customer —
    * multi-GB at 100 TB, so force-broadcasting it would OOM the driver —
    * and both sides hash on o_custkey, so AQE reuses the groupBy
    * exchange for a co-partitioned join (or picks broadcast itself at
    * small SF, where it genuinely fits).
    */
  def newVsReturning(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
      .select(col("o_custkey"), col("o_totalprice"),
        date_trunc("month", col("o_orderdate")).as("month"))
    val firstMonth = o.groupBy("o_custkey")
      .agg(min("month").as("first_month"))
    o.join(firstMonth, "o_custkey")
      .withColumn("segment",
        when(col("month") === col("first_month"), "new").otherwise("returning"))
      .groupBy(date_format(col("month"), "yyyy-MM").as("month"), col("segment"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("revenue"))
      .orderBy("month", "segment")
  }

  /** e11 — revenue Pareto summary: how many customers it takes to reach
    * 50 / 80 / 90 % of total revenue — the concentration question behind
    * every "whale" analysis. The per-customer rollup is the only fact
    * pass; the cumulative share uses [[Cumulative.runningTotal]] — the
    * two-pass range-partitioned running sum — because the rollup here is
    * CUSTOMER-sized (hundreds of millions of rows at 100 TB), so the
    * single-task `Window.orderBy` shortcut that calendar-sized rollups
    * (a15/ts3) get away with would funnel the whole table through one
    * task. Revenue is scaled to integer CENTS before accumulating:
    * integer addition is associative, so the partition-split sum is
    * exactly the sequential sum, and the threshold tests are exact
    * integer inequalities (cum·2 < total, cum·10 < total·8/9) on both
    * engines — no double-summation-order wobble can flip a count.
    */
  def revenuePareto(s: SparkSession, d: String): DataFrame = {
    val per = orders(s, d)
      .groupBy("o_custkey")
      .agg(round(sum("o_totalprice"), 2).as("rev"))
      .withColumn("cents", round(col("rev") * 100, 0).cast("long"))
    val ranked = Cumulative.runningTotal(per, "cents",
      Seq(desc("rev"), asc("o_custkey")), "cum_cents")
    val tot = ranked.agg(max("cum_cents").as("total_cents"))
    ranked.crossJoin(broadcast(tot))
      .agg(
        count(lit(1)).as("n_customers"),
        (sum(when(col("cum_cents") * 2 < col("total_cents"), 1L)
          .otherwise(0L)) + 1).as("n_for_50"),
        (sum(when(col("cum_cents") * 10 < col("total_cents") * 8, 1L)
          .otherwise(0L)) + 1).as("n_for_80"),
        (sum(when(col("cum_cents") * 10 < col("total_cents") * 9, 1L)
          .otherwise(0L)) + 1).as("n_for_90"))
  }

  /** e16 — behavioral transition matrix: counts of (previous event type
    * → event type) steps per user in time order — the Markov-chain input
    * every journey analysis starts from (where do users go after a
    * view?). One lag window partitioned by user_id (hash exchange on the
    * key, per-user groups are session-sized), then a |types|²-row
    * rollup. The sequence is total-ordered by (ts, event_id) so both
    * engines agree on every predecessor under timestamp ties.
    */
  def transitionMatrix(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("prev_type", "next_type")
  }

  /** e15 — revenue-mass deciles: customers bucketed by CUMULATIVE share
    * of total revenue (decile 0 = the whales that make up the first 10 %
    * of revenue), reported as per-decile customer counts and revenue —
    * the distribution table behind e11's three thresholds. NOT ntile():
    * ntile buckets by row count (and its empty-over window single-tasks
    * the table); revenue-mass deciles need the running total, which is
    * [[Cumulative.runningTotal]] again — the operator's second consumer,
    * proving the primitive composes. Decile = cum·10 / total in integer
    * cents (exact on both engines); the LAST customer's cum equals the
    * total, so it is clamped to decile 9.
    */
  def revenueDeciles(s: SparkSession, d: String): DataFrame = {
    val per = orders(s, d)
      .groupBy("o_custkey")
      .agg(round(sum("o_totalprice"), 2).as("rev"))
      .withColumn("cents", round(col("rev") * 100, 0).cast("long"))
    val ranked = Cumulative.runningTotal(per, "cents",
      Seq(desc("rev"), asc("o_custkey")), "cum_cents")
    val tot = ranked.agg(max("cum_cents").as("total_cents"))
    ranked.crossJoin(broadcast(tot))
      .withColumn("decile",
        least(lit(9L), expr("(cum_cents * 10) div total_cents")))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_customers"),
        round(sum("rev"), 2).as("revenue"))
      .orderBy("decile")
  }

  /** e17 — Kaplan-Meier SURVIVAL curve over customer lifetimes: per
    * lifetime month, the at-risk count, deaths (customers whose last
    * order fell there), right-censored exits (still active near the
    * dataset watermark — treating them as churn is the classic
    * retention-curve bias), and the KM estimate
    * S(t) = Π (1 − d_i/n_i). Scale shape: the only fact-sized pass is
    * the per-customer min/max agg; everything after runs on the
    * MONTH-BUCKET rollup (≤ lifetime-months rows — ts3's calendar-size
    * exception), where the sequential product uses ts5's exact-integer
    * discipline (survival in millionths, truncating division on both
    * engines) so the curve is hash-exact — no exp/ln round-trip whose
    * libm noise could flip a rounded digit. Month indices are exact
    * integer year·12+month arithmetic, never months_between fp.
    */
  def survivalRetention(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def mi(c: Column): Column = (year(c) * 12 + month(c)).cast("long")
    val cust = orders(s, d).groupBy(col("o_custkey"))
      .agg(min("o_orderdate").as("first_d"), max("o_orderdate").as("last_d"))
      .select(col("o_custkey"),
        (mi(col("last_d")) - mi(col("first_d"))).as("lifetime_m"),
        mi(col("last_d")).as("last_m"))
    val glob = orders(s, d).agg(max(mi(col("o_orderdate"))).as("gmax"))
    val labeled = cust.crossJoin(broadcast(glob))
      .withColumn("censored", (col("last_m") >= col("gmax") - 2).cast("int"))
    val rollup = labeled.groupBy("lifetime_m")
      .agg(count(when(col("censored") === 0, true)).as("deaths"),
        count(when(col("censored") === 1, true)).as("censored_n"))
    val total = labeled.agg(count(lit(1)).as("total"))
    rollup.crossJoin(broadcast(total))
      .select(col("lifetime_m"), col("deaths"), col("censored_n"), col("total"))
      .as[(Long, Long, Long, Long)]
      .repartition(1).sortWithinPartitions("lifetime_m")
      .mapPartitions { it =>
        var atRisk = -1L; var surv = 1000000L
        it.map { case (lm, dth, cen, tot) =>
          if (atRisk < 0) atRisk = tot
          surv = surv * (atRisk - dth) / atRisk
          val out = (lm, atRisk, dth, cen, surv)
          atRisk -= (dth + cen)
          out
        }
      }.toDF("lifetime_m", "at_risk", "deaths", "censored_n", "survival_u")
      .orderBy("lifetime_m")
  }

  /** e18 — top session paths: the k most common event-type sequences
    * (first `pathLen` events of each session, joined with `>`), the
    * navigation-flow query behind every "where do users go" product
    * dashboard. Sessionization is e2's ≥30-min-gap rule; every window is
    * partitioned by user_id (one logical exchange — the module's scale
    * thread), the path string is assembled from AT MOST `pathLen` events
    * per session (bounded state per group), and only the |distinct
    * paths|-sized rollup reshuffles for the final count. Ties at the
    * top-k boundary break on path text, so the LIMIT is deterministic.
    */
  def sessionPaths(s: SparkSession, d: String, pathLen: Int = 5,
      top: Int = 20): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val sess = events(s, d)
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("prev_ms", lag("ms", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ms").isNull || col("ms") - col("prev_ms") >= 1800000L, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum("new_session").over(byUser.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    val bySess = Window.partitionBy("user_id", "session_id")
      .orderBy("ts", "event_id")
    sess
      .withColumn("rn", row_number().over(bySess))
      .filter(col("rn") <= pathLen)
      .groupBy("user_id", "session_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("rn"), col("event_type")))),
        x => x("event_type")), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(desc("n_sessions"), asc("path"))
      .limit(top)
  }

  /** e19 — per-session metrics via BATCH `session_window`: event count,
    * value sum, and duration for every ≥30-min-gap session — the
    * sessionized-metrics table product analytics joins everything else
    * onto. Declares the BATCH side of the session operator (st19
    * streams it; e2/e18 derive sessions manually with lag/cumsum
    * windows): one hash aggregation keyed by (user, merged session
    * window), no window-function pass at all — at 100 TB that is one
    * shuffle on user_id with in-memory window merging, vs the manual
    * form's sort-heavy lag+cumsum+groupBy chain. Duration is
    * last−first event in SECONDS (exact longs; session_window.end
    * includes the +gap tail, so the oracle uses max(ts) instead).
    * Oracled against e2's gap-rule CTE — the manual and native
    * sessionizations must agree row for row.
    */
  def sessionStats(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 4).as("sum_value"),
        // subtract exact MILLIS then integer-divide: per-timestamp
        // second-truncation differs between engines when the endpoints'
        // sub-second fractions straddle a boundary
        expr("(unix_millis(max(ts)) - unix_millis(min(ts))) div 1000")
          .as("duration_s"))
      .select(col("user_id"),
        date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"), col("sum_value"), col("duration_s"))
      .orderBy("user_id", "session_start")

  /** e20 — A/B experiment READOUT (the two-proportion z-test every
    * product experiment ships with): users assign to arms by md5
    * parity — p6's leakage-proof pure-function bucketing, the
    * deterministic replacement for the RNG assignment an experiment
    * platform does once and persists — exposure = saw a view,
    * conversion = made a purchase, and the readout is per-arm
    * counts/rates plus lift and the pooled two-proportion z statistic.
    * One hash agg per user (the only full-data pass), a 2-row arm
    * rollup, then scalar arithmetic; counts are exact integers so both
    * engines divide identical values and the z is bit-identical.
    */
  def abTestReadout(s: SparkSession, d: String): DataFrame = {
    // unit = exposed USER-DAY (a day the user saw a view), conversion =
    // a same-day purchase; per-user lifetime conversion saturates at 1
    // on any active fixture (z degenerates when p_pool → 1)
    val perUser = events(s, d)
      .groupBy(col("user_id"), to_date(col("ts")).as("day")).agg(
        max(when(col("event_type") === "view", 1).otherwise(0)).as("saw"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("conv"))
    abReadoutFromUnits(perUser)
  }

  /** e20's readout over a prepared (user_id, saw, conv) unit table —
    * shared with the streaming twin (st23), whose unit cube is
    * algebraic and therefore identical to the batch one.
    */
  private[graft] def abReadoutFromUnits(perUser: DataFrame): DataFrame = {
    val armed = perUser.filter(col("saw") === 1)
      .withColumn("arm",
        when(substring(md5(col("user_id").cast("string")), 1, 1)
          .between("0", "7"), "A").otherwise("B"))
    armed.agg(
      sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === "A", col("conv").cast("long")).otherwise(0L)).as("x_a"),
      sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_b"),
      sum(when(col("arm") === "B", col("conv").cast("long")).otherwise(0L)).as("x_b"))
      .withColumn("rate_a", round(col("x_a").cast("double") / col("n_a"), 6))
      .withColumn("rate_b", round(col("x_b").cast("double") / col("n_b"), 6))
      .withColumn("lift", round(
        col("x_a").cast("double") / col("n_a")
          - col("x_b").cast("double") / col("n_b"), 6))
      .withColumn("p_pool",
        (col("x_a") + col("x_b")).cast("double") / (col("n_a") + col("n_b")))
      .withColumn("z", round(
        (col("x_a").cast("double") / col("n_a")
          - col("x_b").cast("double") / col("n_b"))
          / sqrt(col("p_pool") * (lit(1.0) - col("p_pool"))
            * (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 4))
      .select("n_a", "x_a", "rate_a", "n_b", "x_b", "rate_b", "lift", "z")
  }

  /** a23 — AUDIENCE-OVERLAP report: how the viewer, clicker, and buyer
    * populations intersect — the segmentation question behind every
    * funnel/retargeting dashboard ("how many viewers never buy",
    * "are clickers a subset of viewers"). ONE user-keyed hash
    * aggregation derives each user's three membership flags (the only
    * full-data pass — the shuffle carries user ids and three bits),
    * then a 1-row rollup counts every region of the Venn diagram by
    * exact integer sums; inclusion-exclusion identities and the
    * view↔purchase Jaccard ride along. At 100 TB this is the
    * sketch-free exact form; a17's re-aggregatable HLL cube is the
    * approximate path when even the user dictionary is too large —
    * note HLL alone cannot intersect, which is why the exact flag
    * rollup is the primitive worth owning. Fully oracled.
    */
  def audienceOverlap(s: SparkSession, d: String): DataFrame = {
    val flags = events(s, d).groupBy("user_id").agg(
      max(when(col("event_type") === "view", 1L).otherwise(0L)).as("v"),
      max(when(col("event_type") === "click", 1L).otherwise(0L)).as("c"),
      max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
    flags.agg(
      count(lit(1)).as("n_users"),
      sum("v").as("n_view"), sum("c").as("n_click"), sum("p").as("n_purchase"),
      sum(col("v") * col("c")).as("n_view_click"),
      sum(col("v") * col("p")).as("n_view_purchase"),
      sum(col("c") * col("p")).as("n_click_purchase"),
      sum(col("v") * col("c") * col("p")).as("n_all_three"))
      .withColumn("jaccard_view_purchase", round(
        col("n_view_purchase").cast("double") /
          (col("n_view") + col("n_purchase") - col("n_view_purchase")), 6))
  }

  /** e22 — DIFFERENCE-IN-DIFFERENCES readout (Card & Krueger's
    * quasi-experimental workhorse): when a change launches at a point
    * in TIME rather than by randomized assignment, the naive post-vs-pre
    * delta confounds the change with seasonality — DiD subtracts the
    * control arm's own pre→post drift: (rA_post − rA_pre) −
    * (rB_post − rB_pre). Launch day = the midpoint of the event span
    * (deterministic, data-derived); units and arms are e20's exposed
    * user-days and md5-parity buckets, so the 2×2 (arm, period) cube is
    * the only full-data pass — a 4-cell rollup plus scalar arithmetic
    * on exact integers, every rate a division of identical integers on
    * both engines. Fully oracled.
    */
  def didReadout(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val launch = ev.agg(min(to_date(col("ts"))).as("d0"),
        max(to_date(col("ts"))).as("d1"))
      .select(expr("date_add(d0, cast(datediff(d1, d0) div 2 as int))")
        .as("launch"))
    val units = ev
      .groupBy(col("user_id"), to_date(col("ts")).as("day")).agg(
        max(when(col("event_type") === "view", 1).otherwise(0)).as("saw"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
      .filter(col("saw") === 1)
      .withColumn("arm",
        when(substring(md5(col("user_id").cast("string")), 1, 1)
          .between("0", "7"), "A").otherwise("B"))
      .crossJoin(broadcast(launch))
      .withColumn("post", (col("day") >= col("launch")).cast("int"))
    def cell(arm: String, post: Int, c: Column) =
      sum(when(col("arm") === arm && col("post") === post, c).otherwise(0L))
    val cube = units.agg(
      first(col("launch")).as("launch"),
      cell("A", 0, lit(1L)).as("n_a_pre"), cell("A", 0, col("conv")).as("x_a_pre"),
      cell("A", 1, lit(1L)).as("n_a_post"), cell("A", 1, col("conv")).as("x_a_post"),
      cell("B", 0, lit(1L)).as("n_b_pre"), cell("B", 0, col("conv")).as("x_b_pre"),
      cell("B", 1, lit(1L)).as("n_b_post"), cell("B", 1, col("conv")).as("x_b_post"))
    def rate(x: String, n: String) = col(x).cast("double") / col(n)
    cube.select(
      date_format(col("launch"), "yyyy-MM-dd").as("launch_day"),
      col("n_a_pre"), col("n_a_post"), col("n_b_pre"), col("n_b_post"),
      round(rate("x_a_pre", "n_a_pre"), 6).as("rate_a_pre"),
      round(rate("x_a_post", "n_a_post"), 6).as("rate_a_post"),
      round(rate("x_b_pre", "n_b_pre"), 6).as("rate_b_pre"),
      round(rate("x_b_post", "n_b_post"), 6).as("rate_b_post"),
      round((rate("x_a_post", "n_a_post") - rate("x_a_pre", "n_a_pre"))
        - (rate("x_b_post", "n_b_post") - rate("x_b_pre", "n_b_pre")), 6)
        .as("did"))
  }

  /** e21 — CUPED variance-reduced A/B readout (Deng, Xu, Kohavi &
    * Walker 2013, "Improving the Sensitivity of Online Controlled
    * Experiments by Utilizing Pre-Experiment Data"): e20's user-day
    * conversion adjusted by a pre-defined covariate — the user's click
    * count on days STRICTLY BEFORE their first exposed day, i.e.
    * genuinely pre-experiment data as the method requires (an
    * in-experiment covariate would absorb part of any real treatment
    * effect on clicking and bias the adjusted lift) — via
    * y′ = y − θ·(x − x̄) with the pooled θ = cov(x,y)/var(x). The
    * adjusted lift has the SAME expectation (a pre-exposure covariate
    * cannot depend on the assignment) at a fraction of the variance,
    * which is why every mature experiment platform runs it.
    *
    * Exactness: all five moments (Σx, Σy, Σxy, Σx², n) are exact
    * integer sums — the covariate is a count, conversion is 0/1 — so
    * both engines compute identical doubles for θ, the adjusted rates,
    * and the variance-reduction ratio ρ² = cov²/(var·var_y). One
    * (user, day) hash agg + one user-level click rollup joined back
    * (both keyed on user), then a 2-row arm rollup. Fully oracled.
    */
  def cupedReadout(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    // first exposed day per user: exposure = saw a view (e20's rule);
    // the covariate counts only clicks dated strictly before it
    val firstExposed = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(to_date(col("ts"))).as("d0"))
    val clicks = ev.filter(col("event_type") === "click")
      .join(firstExposed, Seq("user_id"))
      .filter(to_date(col("ts")) < col("d0"))
      .groupBy("user_id").agg(count(lit(1)).as("x"))
    val units = ev
      .groupBy(col("user_id"), to_date(col("ts")).as("day")).agg(
        max(when(col("event_type") === "view", 1).otherwise(0)).as("saw"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      .filter(col("saw") === 1)
      .join(clicks, Seq("user_id"), "left")
      .na.fill(0L, Seq("x"))
      .withColumn("arm",
        when(substring(md5(col("user_id").cast("string")), 1, 1)
          .between("0", "7"), "A").otherwise("B"))
    val m = units.agg(
      count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === "A", col("x")).otherwise(0L)).as("sx_a"),
      sum(when(col("arm") === "A", col("y")).otherwise(0L)).as("sy_a"),
      sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_b"),
      sum(when(col("arm") === "B", col("x")).otherwise(0L)).as("sx_b"),
      sum(when(col("arm") === "B", col("y")).otherwise(0L)).as("sy_b"))
    m.withColumn("xbar", col("sx").cast("double") / col("n"))
      .withColumn("covxy", col("sxy").cast("double") / col("n")
        - (col("sx").cast("double") / col("n")) * (col("sy").cast("double") / col("n")))
      .withColumn("varx", col("sxx").cast("double") / col("n")
        - (col("sx").cast("double") / col("n")) * (col("sx").cast("double") / col("n")))
      .withColumn("vary", col("syy").cast("double") / col("n")
        - (col("sy").cast("double") / col("n")) * (col("sy").cast("double") / col("n")))
      .withColumn("theta", col("covxy") / col("varx"))
      .withColumn("rate_a_adj",
        col("sy_a").cast("double") / col("n_a")
          - col("theta") * (col("sx_a").cast("double") / col("n_a") - col("xbar")))
      .withColumn("rate_b_adj",
        col("sy_b").cast("double") / col("n_b")
          - col("theta") * (col("sx_b").cast("double") / col("n_b") - col("xbar")))
      .select(col("n_a"), col("n_b"), round(col("theta"), 6).as("theta"),
        round(col("rate_a_adj"), 6).as("rate_a_adj"),
        round(col("rate_b_adj"), 6).as("rate_b_adj"),
        round(col("rate_a_adj") - col("rate_b_adj"), 6).as("lift_adj"),
        round(col("covxy") * col("covxy") / (col("varx") * col("vary")), 6)
          .as("var_reduction"))
  }

  /** One oracle for the A/B readout in both engines' forms (batch e20,
    * streaming st23): the unit cube is algebraic, so the streamed
    * readout must equal the batch one bit-for-bit.
    */
  val abTestOracle: String =
    """WITH u AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS saw,
      |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      |  FROM events GROUP BY user_id, day),
      |armed AS (
      |  SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
      |      BETWEEN '0' AND '7' THEN 'A' ELSE 'B' END AS arm, conv
      |  FROM u WHERE saw = 1),
      |r AS (
      |  SELECT
      |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(sum(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS BIGINT) AS x_a,
      |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    CAST(sum(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS BIGINT) AS x_b
      |  FROM armed)
      |SELECT n_a, x_a,
      |  round(CAST(x_a AS DOUBLE) / n_a, 6) AS rate_a,
      |  n_b, x_b,
      |  round(CAST(x_b AS DOUBLE) / n_b, 6) AS rate_b,
      |  round(CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b, 6) AS lift,
      |  round((CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b)
      |    / sqrt((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
      |      * (1.0 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
      |      * (1.0 / n_a + 1.0 / n_b)), 4) AS z
      |FROM r""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("a23_audience_overlap", (s, d) => audienceOverlap(s, d), Some(
      """WITH flags AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
        |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
        |  FROM events GROUP BY user_id),
        |cube AS (
        |  SELECT count(*) AS n_users,
        |    CAST(sum(v) AS BIGINT) AS n_view,
        |    CAST(sum(c) AS BIGINT) AS n_click,
        |    CAST(sum(p) AS BIGINT) AS n_purchase,
        |    CAST(sum(v * c) AS BIGINT) AS n_view_click,
        |    CAST(sum(v * p) AS BIGINT) AS n_view_purchase,
        |    CAST(sum(c * p) AS BIGINT) AS n_click_purchase,
        |    CAST(sum(v * c * p) AS BIGINT) AS n_all_three
        |  FROM flags)
        |SELECT *,
        |  round(CAST(n_view_purchase AS DOUBLE)
        |    / (n_view + n_purchase - n_view_purchase), 6)
        |    AS jaccard_view_purchase
        |FROM cube""".stripMargin)),
    QueryDef("e22_did_readout", (s, d) => didReadout(s, d), Some(
      """WITH span AS (
        |  SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
        |  FROM events),
        |l AS (SELECT d0 + CAST((d1 - d0) // 2 AS INTEGER) AS launch FROM span),
        |u AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS saw,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY user_id, day),
        |units AS (
        |  SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
        |      BETWEEN '0' AND '7' THEN 'A' ELSE 'B' END AS arm,
        |    CASE WHEN day >= (SELECT launch FROM l) THEN 1 ELSE 0 END AS post,
        |    conv
        |  FROM u WHERE saw = 1),
        |cube AS (
        |  SELECT
        |    CAST(sum(CASE WHEN arm='A' AND post=0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a_pre,
        |    CAST(sum(CASE WHEN arm='A' AND post=0 THEN conv ELSE 0 END) AS BIGINT) AS x_a_pre,
        |    CAST(sum(CASE WHEN arm='A' AND post=1 THEN 1 ELSE 0 END) AS BIGINT) AS n_a_post,
        |    CAST(sum(CASE WHEN arm='A' AND post=1 THEN conv ELSE 0 END) AS BIGINT) AS x_a_post,
        |    CAST(sum(CASE WHEN arm='B' AND post=0 THEN 1 ELSE 0 END) AS BIGINT) AS n_b_pre,
        |    CAST(sum(CASE WHEN arm='B' AND post=0 THEN conv ELSE 0 END) AS BIGINT) AS x_b_pre,
        |    CAST(sum(CASE WHEN arm='B' AND post=1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b_post,
        |    CAST(sum(CASE WHEN arm='B' AND post=1 THEN conv ELSE 0 END) AS BIGINT) AS x_b_post
        |  FROM units)
        |SELECT strftime((SELECT launch FROM l), '%Y-%m-%d') AS launch_day,
        |  n_a_pre, n_a_post, n_b_pre, n_b_post,
        |  round(CAST(x_a_pre AS DOUBLE) / n_a_pre, 6) AS rate_a_pre,
        |  round(CAST(x_a_post AS DOUBLE) / n_a_post, 6) AS rate_a_post,
        |  round(CAST(x_b_pre AS DOUBLE) / n_b_pre, 6) AS rate_b_pre,
        |  round(CAST(x_b_post AS DOUBLE) / n_b_post, 6) AS rate_b_post,
        |  round((CAST(x_a_post AS DOUBLE) / n_a_post
        |      - CAST(x_a_pre AS DOUBLE) / n_a_pre)
        |    - (CAST(x_b_post AS DOUBLE) / n_b_post
        |      - CAST(x_b_pre AS DOUBLE) / n_b_pre), 6) AS did
        |FROM cube""".stripMargin)),
    QueryDef("e21_cuped", (s, d) => cupedReadout(s, d), Some(
      // the same five exact-integer moments in DuckDB; every double
      // divides identical integers, so θ and the adjusted rates match
      """WITH d0 AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |clicks AS (
        |  SELECT e.user_id, count(*) AS x FROM events e
        |  JOIN d0 USING (user_id)
        |  WHERE e.event_type = 'click' AND CAST(e.ts AS DATE) < d0.d0
        |  GROUP BY e.user_id),
        |u AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS saw,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
        |  FROM events GROUP BY user_id, day),
        |units AS (
        |  SELECT u.user_id, coalesce(c.x, 0) AS x, u.y,
        |    CASE WHEN substr(md5(CAST(u.user_id AS VARCHAR)), 1, 1)
        |      BETWEEN '0' AND '7' THEN 'A' ELSE 'B' END AS arm
        |  FROM u LEFT JOIN clicks c USING (user_id) WHERE u.saw = 1),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy,
        |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN arm = 'A' THEN x ELSE 0 END) AS BIGINT) AS sx_a,
        |    CAST(sum(CASE WHEN arm = 'A' THEN y ELSE 0 END) AS BIGINT) AS sy_a,
        |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN arm = 'B' THEN x ELSE 0 END) AS BIGINT) AS sx_b,
        |    CAST(sum(CASE WHEN arm = 'B' THEN y ELSE 0 END) AS BIGINT) AS sy_b
        |  FROM units),
        |g AS (
        |  SELECT *,
        |    CAST(sx AS DOUBLE) / n AS xbar,
        |    CAST(sxy AS DOUBLE) / n
        |      - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n) AS covxy,
        |    CAST(sxx AS DOUBLE) / n
        |      - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) AS varx,
        |    CAST(syy AS DOUBLE) / n
        |      - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n) AS vary
        |  FROM m),
        |t AS (
        |  SELECT *, covxy / varx AS theta,
        |    CAST(sy_a AS DOUBLE) / n_a
        |      - (covxy / varx) * (CAST(sx_a AS DOUBLE) / n_a - xbar) AS ra,
        |    CAST(sy_b AS DOUBLE) / n_b
        |      - (covxy / varx) * (CAST(sx_b AS DOUBLE) / n_b - xbar) AS rb
        |  FROM g)
        |SELECT n_a, n_b, round(theta, 6) AS theta,
        |  round(ra, 6) AS rate_a_adj, round(rb, 6) AS rate_b_adj,
        |  round(ra - rb, 6) AS lift_adj,
        |  round(covxy * covxy / (varx * vary), 6) AS var_reduction
        |FROM t""".stripMargin)),
    // exact integer counts → both engines divide identical values;
    // md5-parity arm assignment is p6's cross-engine hash discipline
    QueryDef("e20_ab_test", (s, d) => abTestReadout(s, d), Some(abTestOracle)),
    QueryDef("e19_session_stats", (s, d) => sessionStats(s, d), Some(
      """WITH g AS (
        |  SELECT user_id, ts, value, epoch_ms(ts) AS ms,
        |    lag(epoch_ms(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms,
        |    event_id
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts, value,
        |    sum(CASE WHEN prev_ms IS NULL OR ms - prev_ms >= 1800000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM g)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  count(*) AS n_events,
        |  round(sum(value), 4) AS sum_value,
        |  CAST((epoch_ms(max(ts)) - epoch_ms(min(ts))) // 1000 AS BIGINT) AS duration_s
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin)),
    QueryDef("e18_session_paths", (s, d) => sessionPaths(s, d), Some(
      """WITH g AS (
        |  SELECT user_id, ts, event_id, event_type, epoch_ms(ts) AS ms,
        |    lag(epoch_ms(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    sum(CASE WHEN prev_ms IS NULL OR ms - prev_ms >= 1800000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM g),
        |r AS (
        |  SELECT user_id, session_id, event_type,
        |    row_number() OVER (PARTITION BY user_id, session_id ORDER BY ts, event_id) AS rn
        |  FROM s),
        |p AS (
        |  SELECT user_id, session_id,
        |    string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 5 GROUP BY 1, 2)
        |SELECT path, count(*) AS n_sessions
        |FROM p GROUP BY 1 ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin)),
    QueryDef("e17_survival_km", survivalRetention, Some(
      """WITH RECURSIVE cust AS (
        |  SELECT o_custkey,
        |    (year(max(o_orderdate)) * 12 + month(max(o_orderdate)))
        |      - (year(min(o_orderdate)) * 12 + month(min(o_orderdate))) AS lifetime_m,
        |    year(max(o_orderdate)) * 12 + month(max(o_orderdate)) AS last_m
        |  FROM orders GROUP BY 1),
        |g AS (SELECT max(year(o_orderdate) * 12 + month(o_orderdate)) AS gmax
        |  FROM orders),
        |lab AS (SELECT lifetime_m, CAST(last_m >= gmax - 2 AS INT) AS censored
        |  FROM cust CROSS JOIN g),
        |roll AS (
        |  SELECT lifetime_m,
        |    CAST(count(CASE WHEN censored = 0 THEN 1 END) AS BIGINT) AS deaths,
        |    CAST(count(CASE WHEN censored = 1 THEN 1 END) AS BIGINT) AS censored_n
        |  FROM lab GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM lab),
        |idx AS (SELECT lifetime_m, deaths, censored_n, total,
        |    row_number() OVER (ORDER BY lifetime_m) AS t,
        |    CAST(coalesce(sum(deaths + censored_n) OVER (ORDER BY lifetime_m
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS exited
        |  FROM roll CROSS JOIN tot),
        |rec AS (
        |  SELECT t, lifetime_m, total - exited AS at_risk, deaths, censored_n,
        |    (1000000 * (total - exited - deaths)) // (total - exited) AS survival_u
        |  FROM idx WHERE t = 1
        |  UNION ALL
        |  SELECT i.t, i.lifetime_m, i.total - i.exited, i.deaths, i.censored_n,
        |    (r.survival_u * (i.total - i.exited - i.deaths))
        |      // (i.total - i.exited)
        |  FROM idx i JOIN rec r ON i.t = r.t + 1)
        |SELECT lifetime_m, at_risk, deaths, censored_n, survival_u
        |FROM rec ORDER BY lifetime_m""".stripMargin)),
    QueryDef("e16_transition_matrix", (s, d) => transitionMatrix(s, d), Some(
      """WITH g AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_type
        |  FROM events)
        |SELECT prev_type, event_type AS next_type, count(*) AS n
        |FROM g WHERE prev_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    QueryDef("e15_revenue_deciles", (s, d) => revenueDeciles(s, d), Some(
      """WITH per AS (
        |  SELECT o_custkey, round(sum(o_totalprice), 2) AS rev,
        |    CAST(round(round(sum(o_totalprice), 2) * 100, 0) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |t AS (SELECT sum(cents) AS total_cents FROM per),
        |c AS (
        |  SELECT rev, sum(cents) OVER (ORDER BY rev DESC, o_custkey
        |    ROWS UNBOUNDED PRECEDING) AS cum_cents, total_cents
        |  FROM per CROSS JOIN t)
        |SELECT CAST(least(9, cum_cents * 10 // total_cents) AS BIGINT) AS decile,
        |  count(*) AS n_customers, round(sum(rev), 2) AS revenue
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin)),
    QueryDef("e13_ship_latency", (s, d) => shipLatency(s, d), Some(
      """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
        |  count(*) AS n_lines,
        |  round(avg(CAST(datediff('day', o_orderdate, l_shipdate) AS DOUBLE)), 4)
        |    AS mean_days,
        |  round(quantile_cont(CAST(datediff('day', o_orderdate, l_shipdate) AS DOUBLE), 0.5), 1)
        |    AS median_days
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)),
    QueryDef("e12_new_vs_returning", (s, d) => newVsReturning(s, d), Some(
      """WITH o AS (
        |  SELECT o_custkey, o_totalprice,
        |    date_trunc('month', o_orderdate) AS month
        |  FROM orders),
        |f AS (SELECT o_custkey, min(month) AS first_month FROM o GROUP BY 1)
        |SELECT strftime(o.month, '%Y-%m') AS month,
        |  CASE WHEN o.month = f.first_month THEN 'new' ELSE 'returning' END AS segment,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
        |FROM o JOIN f USING (o_custkey)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    QueryDef("e11_revenue_pareto", (s, d) => revenuePareto(s, d), Some(
      // integer-cents cumulative and integer threshold inequalities —
      // mirrors the Spark side exactly, so no double-summation-order
      // difference between engines can flip a boundary count
      """WITH per AS (
        |  SELECT o_custkey, round(sum(o_totalprice), 2) AS rev,
        |    CAST(round(round(sum(o_totalprice), 2) * 100, 0) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |t AS (SELECT sum(cents) AS total_cents FROM per),
        |c AS (
        |  SELECT sum(cents) OVER (ORDER BY rev DESC, o_custkey
        |    ROWS UNBOUNDED PRECEDING) AS cum_cents, total_cents
        |  FROM per CROSS JOIN t)
        |SELECT count(*) AS n_customers,
        |  CAST(sum(CASE WHEN cum_cents * 2 < total_cents THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_for_50,
        |  CAST(sum(CASE WHEN cum_cents * 10 < total_cents * 8 THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_for_80,
        |  CAST(sum(CASE WHEN cum_cents * 10 < total_cents * 9 THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_for_90
        |FROM c""".stripMargin)),
    QueryDef("e9_timebound_funnel", (s, d) => timeBoundFunnel(s, d), Some(
      """WITH p AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id AS cu, ts AS cts FROM events WHERE event_type = 'click'),
        |v AS (SELECT user_id AS vu, ts AS vts FROM events WHERE event_type = 'view'),
        |pc0 AS MATERIALIZED (
        |  SELECT p.event_id, p.user_id, p.ts, c.cts
        |  FROM p ASOF LEFT JOIN c ON p.user_id = c.cu AND p.ts >= c.cts),
        |pc AS MATERIALIZED (
        |  SELECT *, cts IS NOT NULL AND cts >= ts - INTERVAL 24 HOUR AS click_ok
        |  FROM pc0),
        |pv AS MATERIALIZED (
        |  SELECT x.event_id, x.cts, v.vts
        |  FROM (SELECT * FROM pc WHERE click_ok) x
        |  ASOF LEFT JOIN v ON x.user_id = v.vu AND x.cts >= v.vts)
        |SELECT
        |  (SELECT count(*) FROM p) AS n_purchases,
        |  (SELECT CAST(sum(CASE WHEN click_ok THEN 1 ELSE 0 END) AS BIGINT)
        |   FROM pc) AS n_with_click,
        |  (SELECT CAST(sum(CASE WHEN vts IS NOT NULL
        |     AND vts >= cts - INTERVAL 1 HOUR THEN 1 ELSE 0 END) AS BIGINT)
        |   FROM pv) AS n_full_chain""".stripMargin)),
    QueryDef("e8_rfm_segments", (s, d) => rfmSegments(s, d), Some(
      """WITH cust AS (
        |  SELECT o_custkey,
        |    CAST(datediff('day', DATE '1992-01-01', max(o_orderdate)) AS DOUBLE) AS last_day,
        |    CAST(count(*) AS DOUBLE) AS freq,
        |    round(sum(o_totalprice), 2) AS money
        |  FROM orders GROUP BY 1),
        |cuts AS (
        |  SELECT quantile_cont(last_day, [0.25, 0.5, 0.75]) AS rc,
        |    quantile_cont(freq, [0.25, 0.5, 0.75]) AS fc,
        |    quantile_cont(money, [0.25, 0.5, 0.75]) AS mc
        |  FROM cust),
        |sc AS (
        |  SELECT
        |    1 + CAST(last_day > rc[1] AS INT) + CAST(last_day > rc[2] AS INT)
        |      + CAST(last_day > rc[3] AS INT) AS r,
        |    1 + CAST(freq > fc[1] AS INT) + CAST(freq > fc[2] AS INT)
        |      + CAST(freq > fc[3] AS INT) AS f,
        |    1 + CAST(money > mc[1] AS INT) + CAST(money > mc[2] AS INT)
        |      + CAST(money > mc[3] AS INT) AS m,
        |    money
        |  FROM cust CROSS JOIN cuts)
        |SELECT r, f, m, count(*) AS n_cust, round(sum(money), 2) AS revenue
        |FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),
    QueryDef("e23_markov_attribution", (s, d) => markovAttribution(s, d), Some(
      // the full replay: same paths (truncate at first purchase), same
      // transition table, the SAME 50 value-iteration steps rounded to
      // 12 dp per step (g1's per-iteration-rounding discipline makes the
      // fp fixed point hash-matchable), same removal-by-zeroing rule
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, event_type,
        |    row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
        |      ORDER BY ts, event_id) AS rn
        |  FROM events),
        |conv AS (
        |  SELECT user_id, day, min(rn) AS conv_rn FROM ev
        |  WHERE event_type = 'purchase' GROUP BY 1, 2),
        |path AS (
        |  SELECT e.user_id, e.day, e.rn,
        |    CASE WHEN e.event_type = 'purchase' THEN 'CONV'
        |         ELSE e.event_type END AS state
        |  FROM ev e LEFT JOIN conv c USING (user_id, day)
        |  WHERE c.conv_rn IS NULL OR e.rn <= c.conv_rn),
        |trans0 AS (
        |  SELECT COALESCE(lag(state) OVER (PARTITION BY user_id, day
        |      ORDER BY rn), 'START') AS src, state AS dst
        |  FROM path),
        |ends AS (
        |  SELECT state AS src, 'NULL' AS dst FROM (
        |    SELECT state, rn,
        |      max(rn) OVER (PARTITION BY user_id, day) AS mx
        |    FROM path)
        |  WHERE rn = mx AND state <> 'CONV'),
        |counts AS (
        |  SELECT src, dst, CAST(count(*) AS DOUBLE) AS n FROM (
        |    SELECT * FROM trans0 UNION ALL SELECT * FROM ends)
        |  GROUP BY 1, 2),
        |tt AS MATERIALIZED (
        |  SELECT src, dst, n / sum(n) OVER (PARTITION BY src) AS pr
        |  FROM counts),
        |chan AS (
        |  SELECT DISTINCT src AS c FROM tt
        |  WHERE src NOT IN ('START', 'CONV', 'NULL')),
        |scen AS MATERIALIZED (
        |  SELECT 'base' AS scenario, '' AS removed
        |  UNION ALL SELECT c, c FROM chan),
        |states AS MATERIALIZED (SELECT DISTINCT src AS s FROM tt),
        |iter AS (
        |  SELECT 0 AS k, sc.scenario, sc.removed, sv.sl AS sl,
        |    list_transform(sv.sl, x -> CAST(0.0 AS DOUBLE)) AS pl
        |  FROM scen sc, (SELECT list(s ORDER BY s) AS sl FROM states) sv
        |  UNION ALL
        |  SELECT k + 1, scenario, removed, sl, list(p ORDER BY s) AS pl
        |  FROM (
        |    SELECT i.k, i.scenario, i.removed, i.sl, st.s,
        |      round(COALESCE(SUM(t2.pr * CASE
        |        WHEN t2.dst = 'CONV' THEN 1.0
        |        WHEN t2.dst = 'NULL' THEN 0.0
        |        WHEN t2.dst = i.removed THEN 0.0
        |        ELSE COALESCE(i.pl[list_position(i.sl, t2.dst)], 0.0)
        |        END), 0.0), 12) AS p
        |    FROM iter i
        |    CROSS JOIN states st
        |    JOIN tt t2 ON t2.src = st.s
        |    WHERE i.k < 50
        |    GROUP BY i.k, i.scenario, i.removed, i.sl, st.s)
        |  GROUP BY k, scenario, removed, sl),
        |fin AS (
        |  SELECT scenario, pl[list_position(sl, 'START')] AS p
        |  FROM iter WHERE k = 50),
        |res AS (
        |  SELECT f.scenario AS channel,
        |    1 - f.p / (SELECT p FROM fin WHERE scenario = 'base') AS re
        |  FROM fin f WHERE f.scenario <> 'base')
        |SELECT channel, round(re, 6) AS removal_effect,
        |  round(re / sum(re) OVER (), 6) AS attribution
        |FROM res ORDER BY channel""".stripMargin)),
    QueryDef("e7_cohort_retention", cohortRetention, Some(
      """WITH ev AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor((CAST(ts AS DATE) - DATE '1970-01-01') / 7) AS BIGINT)
        |      AS week
        |  FROM events),
        |cohort AS (
        |  SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY 1),
        |sz AS (
        |  SELECT cohort_week, count(*) AS n_cohort FROM cohort GROUP BY 1),
        |act AS (
        |  SELECT c.cohort_week, e.week - c.cohort_week AS age_weeks,
        |    count(*) AS n_active
        |  FROM ev e JOIN cohort c USING (user_id) GROUP BY 1, 2)
        |SELECT a.cohort_week, a.age_weeks, a.n_active,
        |  round(CAST(a.n_active AS DOUBLE) / s.n_cohort, 6) AS retention
        |FROM act a JOIN sz s USING (cohort_week)
        |ORDER BY 1, 2""".stripMargin)),
    // oracle is the NAIVE quadratic overlap join — hash-match proves the
    // binned plan exhaustive (no missed pairs) and duplicate-free
    QueryDef("j10_interval_join", (s, d) => intervalOverlapJoin(s, d), Some(
      s"""WITH $sessionSql
         |SELECT a.user_id AS u1, b.user_id AS u2,
         |  count(*) AS n_overlapping_sessions
         |FROM sessions a JOIN sessions b
         |  ON a.user_id < b.user_id AND a.lo <= b.hi AND b.lo <= a.hi
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)))
}
