package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Data-quality and robust-statistics operators: constraint profiling
  * (the Deequ-shaped "validate before you train" pass every 100 TB
  * ingest runs first), exact median + deterministic mode, and
  * exponentially-weighted smoothing over per-key daily series.
  *
  * Scale notes: dq1 is one hash-agg pass over the fact table plus two
  * anti-joins on DISTINCT keys (the distinct shrinks the shuffle to the
  * key cardinality); a12 is two hash-aggs joined on a 5-row dim;
  * ts1 is one (key, day) agg + a same-key window + a key agg — the
  * window and second agg reuse the first shuffle's hash partitioning.
  */
object Quality {
  import Tables._

  /** a12 — exact median plus a DETERMINISTIC mode per group. Spark's
    * built-in `mode` is tie-arbitrary (as is DuckDB's), so the mode is
    * computed explicitly: most frequent order date, earliest on ties,
    * via max_by over a (count, -epoch_day) struct — lexicographic
    * struct comparison makes the tie-break total, so both engines
    * agree bit-for-bit.
    */
  def medianMode(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val med = o.groupBy("o_orderpriority").agg(
      count(lit(1)).as("n"),
      round(expr("percentile(o_totalprice, 0.5)"), 4).as("median_price"))
    val mode = o.groupBy("o_orderpriority", "o_orderdate")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("o_orderpriority")
      .agg(
        max("cnt").as("mode_n"),
        max_by(col("o_orderdate"),
          struct(col("cnt"), negate(unix_micros(col("o_orderdate").cast("timestamp")))))
          .as("mode_date"))
    med.join(mode, Seq("o_orderpriority"))
      .select("o_orderpriority", "n", "median_price", "mode_date", "mode_n")
      .orderBy("o_orderpriority")
  }

  /** dq1 — one-pass constraint report over lineitem + referential
    * checks: null counts, primary-key duplicate rows, range violations,
    * and orphan foreign keys (lineitem→orders, orders→customer). The
    * scalar branches cross-join as 1×1 rows; the anti-joins run on
    * DISTINCT keys so the shuffled volume is |keys|, not |rows| — at
    * 100 TB the distinct is the difference between shuffling the fact
    * table and shuffling its key dictionary.
    */
  def qualityProfile(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val base = li.agg(
      count(lit(1)).as("n_rows"),
      count(when(col("l_quantity").isNull, true)).as("null_qty"),
      count(when(col("l_quantity") <= 0 || col("l_quantity") > 1000, true))
        .as("qty_range_viol"),
      count(when(col("l_discount") < 0 || col("l_discount") > 1, true))
        .as("discount_viol"),
      count(when(col("l_extendedprice") <= 0, true)).as("price_viol"))
    val dup = li.groupBy("l_orderkey", "l_linenumber")
      .agg(count(lit(1)).as("cnt"))
      .agg(coalesce(sum(when(col("cnt") > 1, col("cnt") - 1)), lit(0L))
        .cast("bigint").as("dup_pk_rows"))
    val liOrphans = li.select("l_orderkey").distinct()
      .join(orders(s, d).select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("orphan_orderkeys"))
    val custOrphans = orders(s, d).select("o_custkey").distinct()
      .join(customer(s, d).select("c_custkey"),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("orphan_custkeys"))
    base.crossJoin(dup).crossJoin(liOrphans).crossJoin(custOrphans)
  }

  /** dq6 — declarative EXPECTATION SUITE (the dbt-test / Great-
    * Expectations shape): the contract is a LIST of named rules —
    * row predicates, value domains, key uniqueness — and the output is
    * one row per rule with its violation count and pass flag, the
    * artifact a CI gate diffs. Scale shape: ALL rules for a table fold
    * into ONE aggregation pass (conditional counts + count-distincts
    * side by side), then `stack` unpivots the single agg row into the
    * per-rule report — 3 table scans total for an 11-rule suite, no
    * per-rule jobs, nothing data-sized past the agg. Checks whose
    * violations are row-identified (dq2's outliers, dq1's orphan keys)
    * stay their own operators; this is the summary gate in front of
    * them.
    */
  def expectationSuite(s: SparkSession, d: String): DataFrame =
    expectationReport(orders(s, d), lineitem(s, d), customer(s, d))

  private[ops] def expectationReport(o: DataFrame, li: DataFrame,
      c: DataFrame): DataFrame = {
    def viol(cond: Column) = count(when(cond, true))
    def table(tbl: String, df: DataFrame,
        rules: Seq[(String, Column)]): DataFrame = {
      val aggs = count(lit(1)).as("n_rows") +:
        rules.map { case (id, v) => v.as(id) }
      val stackArgs = rules.map { case (id, _) => s"'$id', $id" }.mkString(", ")
      df.agg(aggs.head, aggs.tail: _*)
        .selectExpr(s"'$tbl' AS tbl", "n_rows",
          s"stack(${rules.length}, $stackArgs) AS (rule_id, n_viol)")
    }
    val rep = table("orders", o, Seq(
        "totalprice_positive" ->
          viol(col("o_totalprice").isNull || col("o_totalprice") <= 0),
        "orderdate_window" ->
          viol(to_date(col("o_orderdate")) < "1992-01-01" ||
            to_date(col("o_orderdate")) > "2002-12-31"),
        "status_domain" -> viol(!col("o_orderstatus").isin("O", "F", "P")),
        "orderkey_unique" ->
          (count(lit(1)) - countDistinct(col("o_orderkey")))))
      .unionAll(table("lineitem", li, Seq(
        "quantity_range" -> viol(col("l_quantity").isNull ||
          col("l_quantity") <= 0 || col("l_quantity") > 1000),
        "discount_range" ->
          viol(col("l_discount") < 0 || col("l_discount") > 0.1),
        "tax_range" -> viol(col("l_tax") < 0 || col("l_tax") > 0.08),
        "pk_unique" -> (count(lit(1)) -
          countDistinct(col("l_orderkey"), col("l_linenumber"))))))
      .unionAll(table("customer", c, Seq(
        "custkey_unique" -> (count(lit(1)) - countDistinct(col("c_custkey"))),
        "acctbal_not_null" -> viol(col("c_acctbal").isNull),
        "mktsegment_domain" -> viol(!col("c_mktsegment").isin(
          "AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD")))))
    rep.select(col("tbl"), col("rule_id"), col("n_rows"),
        col("n_viol").cast("bigint").as("n_viol"),
        (col("n_viol") === 0).cast("int").as("pass"))
      .orderBy("tbl", "rule_id")
  }

  /** ts1 — per-user exponentially-weighted moving average of the daily
    * value series (α=0.2, adjust-style normalization: weights
    * (1-α)^(last_day-day), so gaps in the calendar decay correctly).
    * Reported at the final observed day only, which turns the windowed
    * recurrence into ONE weighted aggregation — exponents are bounded
    * by the series' day span, so no overflow, and round(4) absorbs the
    * engines' summation-order fp noise.
    */
  def ewmaDaily(s: SparkSession, d: String): DataFrame = {
    val alpha = 0.2
    val daily = events(s, d)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum("value").as("x"))
      .withColumn("di", unix_date(col("day")))
    daily
      .withColumn("span", max("di").over(Window.partitionBy("user_id")) - col("di"))
      .withColumn("wt", pow(lit(1 - alpha), col("span")))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_days"),
        round(sum(col("x") * col("wt")) / sum(col("wt")), 4).as("ewma"))
      .orderBy("user_id")
  }

  /** dq2 — robust anomaly detection on the daily revenue series per
    * order priority: median/MAD (not mean/stddev — one fat-finger day
    * would drag a mean-based threshold toward itself) with the standard
    * 1.4826 consistency constant. Exact percentiles at this grouping
    * are cheap because the DAILY series is already aggregated — the
    * percentile runs over ~365·groups rows regardless of fact-table
    * size; at 100 TB the only full-data pass is the first daily rollup.
    * Daily revenues are rounded BEFORE the medians so both engines
    * compute statistics on identical doubles.
    */
  def madOutliers(s: SparkSession, d: String, k: Double = 3.0): DataFrame = {
    val daily = orders(s, d)
      .groupBy(col("o_orderpriority").as("prio"),
        to_date(col("o_orderdate")).as("day"))
      .agg(round(sum("o_totalprice"), 2).as("rev"))
    val med = daily.groupBy("prio")
      .agg(expr("percentile(rev, 0.5)").as("med"))
    val withDev = daily.join(med, Seq("prio"))
      .withColumn("absdev", abs(col("rev") - col("med")))
    val mad = withDev.groupBy("prio")
      .agg(expr("percentile(absdev, 0.5)").as("mad"))
    withDev.join(mad, Seq("prio"))
      .filter(col("absdev") > lit(k) * lit(1.4826) * col("mad"))
      .select(col("prio"), col("day"), col("rev"),
        when(col("mad") > 0,
          round((col("rev") - col("med")) / (lit(1.4826) * col("mad")), 4))
          .as("robust_z"))
      .orderBy("prio", "day")
  }

  /** dq3 — cross-table reconciliation: does each order's header total
    * agree with the sum of its line items (extended price net of
    * discount, plus tax)? The staple "did the ingest drop rows" audit.
    * One fact-side aggregation keyed on the join key (so the agg and
    * the join share a single hash partitioning), then a left join back
    * to headers — orders with NO lines count as fully drifted. Per-order
    * line totals are rounded to cents BEFORE the drift math so both
    * engines aggregate identical doubles.
    */
  def reconcileOrders(s: SparkSession, d: String, tol: Double = 1.0): DataFrame = {
    val lineTotals = lineitem(s, d)
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
        * (lit(1) + col("l_tax"))), 2).as("line_total"))
    orders(s, d)
      .join(lineTotals, Seq("o_orderkey"), "left")
      .withColumn("drift",
        round(abs(col("o_totalprice") - coalesce(col("line_total"), lit(0.0))), 2))
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n_orders"),
        count(when(col("line_total").isNull, true)).as("n_lineless"),
        count(when(col("drift") > tol, true)).as("n_drifted"),
        round(max("drift"), 2).as("max_drift"),
        round(avg("drift"), 2).as("avg_drift"))
      .orderBy("o_orderstatus")
  }

  /** dq4 — k-anonymity suppression release: aggregate statistics over
    * quasi-identifier groups (nation × market segment), with every group
    * smaller than k collapsed into a single '*' bucket so no released
    * row describes fewer than k individuals — the standard privacy gate
    * before handing grouped statistics outside the data boundary. One
    * hash agg over the fact table builds the group table; the release
    * and the suppressed remainder both derive from that already-tiny
    * grouped result, so at 100 TB the only wide op is the first groupBy
    * and the k-decision runs on group cardinalities, never on rows.
    * Averages are computed from merged (sum, count) partials AFTER the
    * suppression union — algebraic, so the '*' bucket's mean is exact,
    * not an average of averages.
    */
  def kAnonymity(s: SparkSession, d: String, k: Long = 10): DataFrame = {
    val g = customer(s, d)
      .groupBy(col("c_nationkey").cast("string").as("nation"),
        col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n"), sum("c_acctbal").as("bal"))
      .cache() // tiny (|nations|×|segments| rows), read twice below
    val suppressed = g.filter(col("n") < k)
      .agg(sum("n").as("n"), sum("bal").as("bal"))
      .select(lit("*").as("nation"), lit("*").as("segment"),
        col("n"), col("bal"))
      .filter(col("n").isNotNull) // no small groups → no '*' row
    g.filter(col("n") >= k).unionByName(suppressed)
      .select(col("nation"), col("segment"), col("n"),
        round(col("bal") / col("n"), 2).as("avg_acctbal"))
      .orderBy("nation", "segment")
  }

  /** dq9 — l-DIVERSITY audit, dq4's complement (Machanavajjhala et al.
    * 2007): k-anonymity bounds GROUP SIZE but a group of 50 records
    * that all share one sensitive value still discloses it — each
    * quasi-identifier group must also contain ≥ l DISTINCT sensitive
    * values. Same QI groups as dq4 (nation × segment); the sensitive
    * attribute is the account-balance BAND (floor(bal_cents / 200000)
    * — exact integer banding, the categorical generalization the
    * l-test needs). One hash aggregation with count + count(DISTINCT
    * band) per group — group-count-sized work at any corpus scale —
    * and the verdict compares exact integers. Fully oracled.
    */
  def lDiversity(s: SparkSession, d: String, l: Long = 3): DataFrame =
    customer(s, d)
      .select(col("c_nationkey").cast("string").as("nation"),
        col("c_mktsegment").as("segment"),
        expr("cast(round(round(c_acctbal, 2) * 100, 0) as bigint) div 200000")
          .as("band"))
      .groupBy("nation", "segment")
      .agg(count(lit(1)).as("n"),
        countDistinct("band").as("n_bands"))
      .withColumn("diverse", (col("n_bands") >= l).cast("int"))
      .orderBy("nation", "segment")

  /** ts2 — seasonal-naive forecast backtest: forecast each of the last 7
    * days' revenue by the historical mean of its day-of-week, report
    * per-day absolute percentage error — the standard sanity baseline
    * every forecasting pipeline is graded against (if a model can't
    * beat dow-means, it isn't a model). The only full-data pass is the
    * daily rollup; the cutoff (max day − 7) and the 7-row dow-mean table
    * are broadcast scalars, so the backtest costs |days| rows of work
    * after the first agg no matter the table size. Revenues are rounded
    * BEFORE the means so both engines average identical doubles; the
    * dow join key stays internal, so Spark's and DuckDB's different
    * weekday numberings never meet.
    */
  def seasonalBacktest(s: SparkSession, d: String): DataFrame = {
    val daily = orders(s, d)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(round(sum("o_totalprice"), 2).as("rev"))
    val mx = daily.agg(max("day").as("mx"))
    val lab = daily.crossJoin(broadcast(mx))
      .withColumn("is_test", col("day") > col("mx") - expr("INTERVAL 7 DAYS"))
      .withColumn("dow", dayofweek(col("day")))
    val f = lab.filter(!col("is_test")).groupBy("dow")
      .agg(round(avg("rev"), 4).as("forecast"))
    lab.filter(col("is_test"))
      .join(broadcast(f), "dow")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("rev").as("actual"), col("forecast"),
        round(abs(col("rev") - col("forecast")) / col("rev"), 6).as("ape"))
      .orderBy("day")
  }

  /** dq5 — categorical distribution drift between the first and second
    * half of the event timeline: per-category shares in each period plus
    * the category's chi-square contribution against the pooled
    * distribution — the standard "did my input mix shift?" monitor a
    * training pipeline runs before trusting a new ingest. One fact-table
    * pass builds the (category × period) counts; the timeline midpoint
    * and the period totals are broadcast scalars, so everything after
    * the first agg is |categories|-row work. Integer counts divide as
    * doubles explicitly on both engines (DuckDB's `/` on BIGINT
    * truncates; Spark's doesn't — the casts make them agree).
    */
  def categoryDrift(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("event_type"), unix_millis(col("ts")).as("ms"))
    val b = ev.agg(min("ms").as("lo"), max("ms").as("hi"))
    val per = ev.crossJoin(broadcast(b))
      .withColumn("late", (col("ms") * 2 > col("lo") + col("hi")).cast("int"))
      .groupBy("event_type")
      .agg(
        sum(when(col("late") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("late") === 1, 1L).otherwise(0L)).as("n_b"))
    val tot = per.agg(sum("n_a").as("ta"), sum("n_b").as("tb"))
    val pooled = (col("n_a") + col("n_b")).cast("double") /
      (col("ta") + col("tb")).cast("double")
    per.crossJoin(broadcast(tot))
      .withColumn("share_a", col("n_a").cast("double") / col("ta").cast("double"))
      .withColumn("share_b", col("n_b").cast("double") / col("tb").cast("double"))
      .withColumn("chi2",
        pow(col("n_a") - pooled * col("ta"), 2) / (pooled * col("ta")) +
          pow(col("n_b") - pooled * col("tb"), 2) / (pooled * col("tb")))
      .select(col("event_type"), col("n_a"), col("n_b"),
        round(col("share_a"), 6).as("share_a"),
        round(col("share_b"), 6).as("share_b"),
        round(col("chi2"), 6).as("chi2_contrib"),
        (abs(col("share_a") - col("share_b")) > 0.01).cast("int").as("drifted"))
      .orderBy("event_type")
  }

  /** dq10 — Population Stability Index over the event-value
    * distribution: the standard model-monitoring drift gate (the
    * credit-scorecard PSI) and dq5's NUMERIC complement — dq5 chi-squares
    * categorical shares, PSI measures how far a continuous
    * distribution's decile histogram moved:
    * Σ (share_b − share_a)·ln(share_b / share_a), read against the
    * conventional bands (< 0.1 stable, 0.1–0.25 moderate, > 0.25
    * shifted). Bins are the FIRST half's deciles (the reference
    * window), so the expected share per bin is 0.1 by construction and
    * the statistic isolates genuine movement in the comparison half.
    *
    * Shape at scale: one fact pass for the cuts (ONE exact-percentile
    * agg whose 9-double result broadcasts back — e8's discipline, never
    * ntile's single-task window), one fact pass for bin+count (the bin
    * is a 9-element array probe, codegen'd, map-side combinable), then
    * |bins|-row math with the totals broadcast (a16). Values roll up to
    * exact integer cents; shares are exact-int divisions, so both
    * engines ln/round identical doubles. The 1e-6 share floor keeps an
    * empty bin's contribution finite and deterministic.
    */
  def psiDrift(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(
      expr("cast(round(value * 100) as bigint)").as("c"),
      unix_millis(col("ts")).as("ms"))
    val b = ev.agg(min("ms").as("lo"), max("ms").as("hi"))
    val halves = ev.crossJoin(broadcast(b))
      .withColumn("late", (col("ms") * 2 > col("lo") + col("hi")).cast("int"))
    val cuts = halves.filter(col("late") === 0)
      .agg(percentile(col("c"),
        typedlit((1 to 9).map(_ / 10.0))).as("cuts"))
    val binned = halves.crossJoin(broadcast(cuts))
      .withColumn("bin", expr("size(filter(cuts, x -> c > x))"))
      .groupBy("bin").agg(
        sum(when(col("late") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("late") === 1, 1L).otherwise(0L)).as("n_b"))
    psiFromBinned(binned)
  }

  /** dq10's PSI arithmetic over a (bin, n_a, n_b) count cube — shared
    * with st21, whose STREAMED cube must feed the identical math to
    * share dq10's oracle verbatim.
    */
  private[graft] def psiFromBinned(binned: DataFrame): DataFrame = {
    val tot = binned.agg(sum("n_a").as("ta"), sum("n_b").as("tb"))
    binned.crossJoin(broadcast(tot))
      .withColumn("share_a",
        greatest(col("n_a").cast("double") / col("ta").cast("double"), lit(1e-6)))
      .withColumn("share_b",
        greatest(col("n_b").cast("double") / col("tb").cast("double"), lit(1e-6)))
      .withColumn("psi",
        (col("share_b") - col("share_a")) * log(col("share_b") / col("share_a")))
      .select(col("bin"), col("n_a"), col("n_b"),
        round(col("share_a"), 6).as("share_a"),
        round(col("share_b"), 6).as("share_b"),
        round(col("psi"), 6).as("psi_contrib"))
      .orderBy("bin")
  }

  /** ts3 — STL-lite decomposition of the daily revenue series:
    * trend = centered 7-day rolling mean, seasonal = day-of-week mean of
    * the detrended series, residual = what neither explains — the
    * decomposition behind every "is this dip seasonal or real?" triage.
    * Like a15/ts2, the empty-partition windows run on the CALENDAR-SIZED
    * daily rollup (the one fact-table pass is the first agg), so the
    * global ordering is |days| rows on one task by construction, not an
    * accident of scale. Revenues are rounded before the windows so both
    * engines decompose identical doubles; dow stays internal (engine
    * weekday numberings never meet).
    */
  def stlDecompose(s: SparkSession, d: String): DataFrame = {
    val daily = orders(s, d)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(round(sum("o_totalprice"), 2).as("rev"))
    // partition-less window is safe HERE: input is the post-aggregate
    // daily rollup (|days| rows, calendar-sized at any corpus scale)
    val wTrend = Window.orderBy("day").rowsBetween(-3, 3)
    val detrended = daily
      .withColumn("trend", round(avg("rev").over(wTrend), 4))
      .withColumn("detr", col("rev") - col("trend"))
      .withColumn("dow", dayofweek(col("day")))
    val seasonal = detrended.groupBy("dow")
      .agg(round(avg("detr"), 4).as("seasonal"))
    detrended.join(broadcast(seasonal), "dow")
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("rev"), col("trend"), col("seasonal"),
        round(col("detr") - col("seasonal"), 4).as("residual"))
      .orderBy("day")
  }

  /** ts4 — CUSUM change-point detection on the daily revenue series:
    * the day where the cumulative deviation from the global mean peaks —
    * the standard "when did the level shift" screen before alerting or
    * retraining on drifted data. Exactness discipline: the textbook
    * statistic cum_t − t·mean is fractional, so both sides compute its
    * integer multiple N·cum_t − t·total in CENTS — every operand exact,
    * no fp summation anywhere, the argmax cannot wobble between engines
    * (ties broken by later day, pinned in the ORDER BY). The only
    * windows run over the calendar-sized daily rollup (the a15/ts3
    * exception), never the fact table; magnitudes stay inside long
    * (cents·days ≈ 5·10¹⁸ at 100 TB — at larger scales switch the
    * statistic to DECIMAL(38)).
    */
  def cusumChangepoint(s: SparkSession, d: String): DataFrame = {
    val daily = orders(s, d)
      .groupBy(col("o_orderdate").as("day"))
      .agg(round(round(sum("o_totalprice"), 2) * 100, 0).cast("long").as("cents"))
    val tot = daily.agg(count(lit(1)).as("n_days"), sum("cents").as("total_cents"))
    // partition-less windows safe HERE: input is the |days|-row
    // post-aggregate rollup, calendar-sized at any corpus scale
    val ord = Window.orderBy("day")
    val cum = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("t", row_number().over(ord).cast("long"))
      .withColumn("cum", sum("cents").over(cum))
      .crossJoin(broadcast(tot))
      .withColumn("abs_dev",
        abs(col("n_days") * col("cum") - col("t") * col("total_cents")))
      .orderBy(desc("abs_dev"), desc("day"))
      .limit(1)
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_days"), col("abs_dev"))
  }

  /** ts5 — Holt linear (double-exponential) smoothing of the daily
    * revenue series: level_t = α·x_t + (1−α)(level+trend),
    * trend_t = β·(level_t − level_{t−1}) + (1−β)·trend — the forecast
    * behind every "where is this metric heading" panel, one step beyond
    * ts1's trendless EWMA. The recurrence is inherently sequential, so it
    * runs as ONE pass over the calendar-sized daily rollup on a single
    * partition (the ts3/ts4 exception: the only fact-table-sized work is
    * the first groupBy; |days| rows thereafter regardless of scale).
    * Exactness discipline: α=1/5 and β=1/10 as exact rationals over
    * micro-cent longs with truncating integer division — Scala `/` and
    * DuckDB `//` both truncate toward zero — so every state value is an
    * exact integer and the hash cannot wobble; quantization error is
    * ≤ 1 micro-cent per step. Emitted values stay integer (micro-cents)
    * for the same reason ts4 emits cents: no float leaves the operator.
    */
  def holtSmoothing(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = orders(s, d)
      .groupBy(col("o_orderdate").as("day"))
      .agg((round(round(sum("o_totalprice"), 2) * 100, 0).cast("long") * 10000L)
        .as("xs"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("xs"))
    val smoothed = daily.as[(String, Long)]
      .repartition(1).sortWithinPartitions("day")
      .mapPartitions { it =>
        var lvl = 0L; var trd = 0L; var first = true
        it.map { case (day, xs) =>
          if (first) { lvl = xs; trd = 0L; first = false }
          else {
            val l1 = (xs + 4L * (lvl + trd)) / 5L
            trd = (l1 - lvl + 9L * trd) / 10L
            lvl = l1
          }
          (day, xs, lvl, trd)
        }
      }.toDF("day", "xs", "lvl", "trd")
    smoothed.select(col("day"),
      expr("xs div 10000").as("rev_cents"),
      col("lvl").as("level_u"), col("trd").as("trend_u"),
      (col("lvl") + col("trd")).as("forecast_u"))
      .orderBy("day")
  }

  /** dq7 — FRESHNESS / staleness SLA audit per event source: how far
    * each source's newest event lags the corpus watermark, whether it
    * breaches the SLA, and whether it is still flowing (events inside
    * the trailing 24 h window). The ingestion-health page every
    * multi-source pipeline needs — a source that silently stops is
    * invisible to row-count checks (dq1) because its historical rows
    * are all still there. One fact pass: the watermark is a broadcast
    * 1-row aggregate (the dq5 shape), lag is exact integer micros
    * (`div`, no fp), and the per-source agg is map-side combinable.
    */
  def freshnessAudit(s: SparkSession, d: String, slaHours: Long = 4): DataFrame = {
    val ev = events(s, d)
      .select(col("event_type"), col("ts"), unix_micros(col("ts")).as("us"))
    val glob = ev.agg(max("us").as("glob_us"))
    ev.crossJoin(broadcast(glob))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        date_format(max("ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"),
        expr("(max(glob_us) - max(us)) div 3600000000").as("lag_hours"),
        count(when(col("us") > col("glob_us") - lit(86400000000L), true))
          .as("n_last_24h"))
      .withColumn("stale", (col("lag_hours") >= slaHours).cast("int"))
      .orderBy("event_type")
  }

  /** ts7 — Holt–Winters ADDITIVE seasonal smoothing (α=1/5, β=1/10,
    * γ=1/5, weekly period 7) of daily revenue — ts5's Holt plus the
    * seasonal component, the classic triple-exponential forecaster for
    * series with a weekly rhythm. All three recurrences run in exact
    * integer sub-units (cents × 10⁴) with TRUNCATING division — Scala
    * `Long./` truncates toward zero and DuckDB `//` does the same
    * (measured: -7//2 = -3), so both engines walk bit-identical state,
    * including the 7-slot seasonal ring buffer (a LIST carried through
    * the oracle's recursive CTE). Like ts5, the sequential fold runs in
    * ONE task over the CALENDAR-sized rollup — the only full-data pass
    * is the daily aggregation; a fold whose every step needs last week's
    * state has no parallel form, and |days| rows is driver-trivial at
    * any corpus scale.
    */
  def holtWintersSmoothing(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = orders(s, d)
      .groupBy(col("o_orderdate").as("day"))
      .agg((round(round(sum("o_totalprice"), 2) * 100, 0).cast("long") * 10000L)
        .as("xs"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("xs"))
    val smoothed = daily.as[(String, Long)]
      .repartition(1).sortWithinPartitions("day")
      .mapPartitions { it =>
        var lvl = 0L; var trd = 0L
        val seas = Array.fill(7)(0L) // ring: seas(0) = s_{t-7}, oldest first
        var first = true
        it.map { case (day, xs) =>
          if (first) { lvl = xs; trd = 0L; first = false }
          else {
            val so = seas(0)
            val l1 = (xs - so + 4L * (lvl + trd)) / 5L
            trd = (l1 - lvl + 9L * trd) / 10L
            val s1 = ((xs - l1) + 4L * so) / 5L
            lvl = l1
            System.arraycopy(seas, 1, seas, 0, 6)
            seas(6) = s1
          }
          (day, xs, lvl, trd, seas(6), lvl + trd + seas(0))
        }
      }.toDF("day", "xs", "lvl", "trd", "season_u", "forecast_u")
    smoothed.select(col("day"),
      expr("xs div 10000").as("rev_cents"),
      col("lvl").as("level_u"), col("trd").as("trend_u"),
      col("season_u"), col("forecast_u"))
      .orderBy("day")
  }

  /** dq8 — Benford first-digit audit over order amounts: the classic
    * fabricated-data screen (Benford 1938; standard in fraud/forensic
    * accounting). First significant digit extracted from exact integer
    * CENTS (first digit of the cents integer = first significant digit
    * of the 2dp amount, since every amount ≥ 0.01) — string-of-integer,
    * no float log in the binning, so the 9-row histogram is bit-exact
    * cross-engine. Expected shares log10(1+1/d) and the chi-squared
    * terms are double arithmetic on that exact histogram, rounded 6dp.
    * Scale shape: one narrow pass + a 9-row agg; the 1-row total rejoins
    * as a broadcast (a16's partials discipline).
    */
  def benfordAudit(s: SparkSession, d: String): DataFrame = {
    val cents = round(round(col("o_totalprice"), 2) * 100, 0).cast("long")
    val byDigit = orders(s, d)
      .select(substring(cents.cast("string"), 1, 1).cast("int").as("digit"))
      .filter(col("digit").between(1, 9))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val tot = byDigit.agg(sum("n").as("total"))
    val p = log10(lit(1.0) + lit(1.0) / col("digit"))
    byDigit.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        round(col("n") / col("total"), 6).as("observed_share"),
        round(p, 6).as("expected_share"),
        round(pow(col("n") - col("total") * p, 2) / (col("total") * p), 6)
          .as("chi2_term"))
      .orderBy("digit")
  }

  /** ts6 — Theil–Sen robust trend of daily revenue: median of all
    * pairwise slopes, the estimator a single outlier day cannot drag
    * (unlike a14's least squares — this is its robust twin). Slopes are
    * built from the daily rollup of the TRAILING YEAR only — a trend
    * estimate is a statement about the recent series, and the window is
    * what bounds the pair set BY DESIGN: 365² ≈ 66k pairs at any corpus
    * span (an unwindowed multi-year series would put |days|² pairs —
    * 2.9M at sf0.1's 2405 days — through the exact median's single
    * final-task state, measured at 12.5 s in the bench). The exact
    * median over the bounded pair set is the a6 Spark-percentile ↔
    * DuckDB-quantile_cont pairing. Slope values are BIGINT-cents
    * differences over integer day gaps, so both engines divide identical
    * integers and sort identical doubles. Intercept = median residual at
    * the window's first day (the standard Theil–Sen intercept), computed
    * on the |days|-row rollup with the 1-row median slope broadcast
    * back. The rollup is cached: it feeds the window cut, both join
    * sides, and the residual pass.
    */
  def theilSenTrend(s: SparkSession, d: String, windowDays: Int = 365): DataFrame = {
    val allDaily = orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(round(round(sum("o_totalprice"), 2) * 100, 0).cast("long").as("cents"))
      .cache()
    val hi = allDaily.agg(max("day").as("dmax"))
    val daily = allDaily.crossJoin(broadcast(hi))
      .filter(datediff(col("dmax"), col("day")) < windowDays)
      .select("day", "cents")
      .cache()
    val a = daily.select(col("day").as("d1"), col("cents").as("c1"))
    val b = daily.select(col("day").as("d2"), col("cents").as("c2"))
    val slopes = a.join(b, datediff(col("d2"), col("d1")) > 0)
      .select(((col("c2") - col("c1")).cast("double") /
        datediff(col("d2"), col("d1"))).as("slope"))
    val m = slopes.agg(expr("percentile(slope, 0.5)").as("m"),
      count(lit(1)).as("n_pairs"))
    val first = daily.agg(min("day").as("day0"), count(lit(1)).as("n_days"))
    val result = daily.crossJoin(broadcast(m)).crossJoin(broadcast(first))
      .select(col("n_days"), col("n_pairs"), col("m"),
        (col("cents").cast("double") -
          col("m") * datediff(col("day"), col("day0"))).as("r"))
      .groupBy()
      .agg(max("n_days").as("n_days"), max("n_pairs").as("n_pairs"),
        round(max("m"), 6).as("slope_cents_per_day"),
        round(expr("percentile(r, 0.5)"), 4).as("intercept_cents"))
    // the result is ONE row: compute it eagerly while the caches are
    // live, then unpersist both — a caller that never clears its session
    // cache must not inherit this query's intermediates
    val rows = result.collect()
    allDaily.unpersist(blocking = false)
    daily.unpersist(blocking = false)
    s.createDataFrame(java.util.Arrays.asList(rows: _*), result.schema)
  }

  /** dq12 — INGEST-COMPLETENESS / volume-anomaly audit: the
    * did-yesterday's-load-arrive check a warehouse runs before every
    * downstream job trusts a time-partitioned table. The full calendar
    * between the table's first and last day is generated (a silently
    * MISSING day is precisely what a groupBy over existing rows can't
    * see), each day's row count compared to its trailing-7-day window:
    * `gap` (zero rows), `low` (under half the trailing mean), `high`
    * (over double), else `ok`. The comparisons are integer
    * cross-multiplications (2·n·cnt < sum etc.), never float division
    * — bit-exact cross-engine, ts4's discipline.
    *
    * Scale: one full-data hash agg to the per-day rollup; the calendar
    * explode and the trailing window run on the calendar-sized table
    * only (a15/ts3's discipline — thousands of rows at any corpus
    * size). Fully oracled.
    */
  def ingestCompletenessAudit(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val span = daily.agg(min("day").as("d0"), max("day").as("d1"))
    val calendar = span
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val grid = calendar.join(daily, Seq("day"), "left")
      .na.fill(0L, Seq("n"))
    // partition-less window safe HERE: the grid is one row per calendar
    // day of the fixture's range — bounded at any corpus scale
    val w = Window.orderBy("day").rowsBetween(-7, -1)
    grid
      .withColumn("sum7", sum("n").over(w))
      .withColumn("cnt7", count(lit(1)).over(w))
      .withColumn("status",
        when(col("n") === 0, "gap")
          .when(col("cnt7") > 0 && col("n") * 2 * col("cnt7") < col("sum7"), "low")
          .when(col("cnt7") > 0 && col("n") * col("cnt7") > col("sum7") * 2, "high")
          .otherwise("ok"))
      .select(col("day"), col("n").as("n_events"),
        coalesce(col("sum7"), lit(0L)).as("trail7_sum"),
        col("cnt7").as("trail7_days"), col("status"))
      .orderBy("day")
  }

  /** dq11 — REFERENTIAL-INTEGRITY AUDIT: orphan counts and rates for
    * every foreign-key edge of the star schema (orders→customer,
    * lineitem→orders/part/supplier, customer→nation) — the audit a
    * warehouse runs before trusting any join-based metric, since an
    * orphaned FK silently DROPS rows from every inner join downstream
    * (a revenue rollup that loses 2% of lineitems to a bad partkey
    * under-reports with no error anywhere). Each edge is one
    * LEFT-ANTI join on the key projection plus a 1-row count; the
    * five 1-row results union into the report.
    *
    * Scale: the anti join ships only the key column, Spark broadcasts
    * the parent side when it fits and AQE falls back to a shuffled
    * anti join when it doesn't (customer at 100 TB) — both plans scan
    * the child exactly once; the crossJoins are 1-row×1-row.
    */
  def refIntegrityAudit(s: SparkSession, d: String): DataFrame = {
    def edge(rel: String, child: DataFrame, fk: String,
        parent: DataFrame, pk: String): DataFrame = {
      val tot = child.agg(count(lit(1)).as("n_rows"))
      val orph = child.select(col(fk))
        .join(parent.select(col(pk).as(fk)), Seq(fk), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      tot.crossJoin(orph).select(
        lit(rel).as("relation"), col("n_rows"), col("n_orphans"),
        round(col("n_orphans").cast("double") / col("n_rows"), 6)
          .as("orphan_rate"))
    }
    Seq(
      edge("customer->nation", Tables.customer(s, d), "c_nationkey",
        Tables.nation(s, d), "n_nationkey"),
      edge("lineitem->orders", Tables.lineitem(s, d), "l_orderkey",
        Tables.orders(s, d), "o_orderkey"),
      edge("lineitem->part", Tables.lineitem(s, d), "l_partkey",
        Tables.part(s, d), "p_partkey"),
      edge("lineitem->supplier", Tables.lineitem(s, d), "l_suppkey",
        Tables.supplier(s, d), "s_suppkey"),
      edge("orders->customer", Tables.orders(s, d), "o_custkey",
        Tables.customer(s, d), "c_custkey"))
      .reduce(_.unionByName(_))
      .orderBy("relation")
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("dq12_completeness", (s, d) => ingestCompletenessAudit(s, d), Some(
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1),
        |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        |cal AS (
        |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
        |    AS day
        |  FROM span),
        |grid AS (
        |  SELECT c.day, coalesce(d.n, 0) AS n
        |  FROM cal c LEFT JOIN daily d USING (day)),
        |win AS (
        |  SELECT day, n,
        |    CAST(coalesce(sum(n) OVER (ORDER BY day
        |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS sum7,
        |    CAST(count(*) OVER (ORDER BY day
        |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS cnt7
        |  FROM grid)
        |SELECT day, CAST(n AS BIGINT) AS n_events, sum7 AS trail7_sum,
        |  cnt7 AS trail7_days,
        |  CASE WHEN n = 0 THEN 'gap'
        |       WHEN cnt7 > 0 AND n * 2 * cnt7 < sum7 THEN 'low'
        |       WHEN cnt7 > 0 AND n * cnt7 > sum7 * 2 THEN 'high'
        |       ELSE 'ok' END AS status
        |FROM win ORDER BY day""".stripMargin)),
    QueryDef("dq11_ref_integrity", (s, d) => refIntegrityAudit(s, d), Some(
      """WITH e1 AS (
        |  SELECT 'customer->nation' AS relation, count(*) AS n_rows,
        |    count(*) FILTER (WHERE NOT EXISTS (SELECT 1 FROM nation WHERE n_nationkey = c_nationkey)) AS n_orphans
        |  FROM customer),
        |e2 AS (
        |  SELECT 'lineitem->orders' AS relation, count(*) AS n_rows,
        |    count(*) FILTER (WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)) AS n_orphans
        |  FROM lineitem),
        |e3 AS (
        |  SELECT 'lineitem->part' AS relation, count(*) AS n_rows,
        |    count(*) FILTER (WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey)) AS n_orphans
        |  FROM lineitem),
        |e4 AS (
        |  SELECT 'lineitem->supplier' AS relation, count(*) AS n_rows,
        |    count(*) FILTER (WHERE NOT EXISTS (SELECT 1 FROM supplier WHERE s_suppkey = l_suppkey)) AS n_orphans
        |  FROM lineitem),
        |e5 AS (
        |  SELECT 'orders->customer' AS relation, count(*) AS n_rows,
        |    count(*) FILTER (WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)) AS n_orphans
        |  FROM orders),
        |u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2 UNION ALL SELECT * FROM e3
        |      UNION ALL SELECT * FROM e4 UNION ALL SELECT * FROM e5)
        |SELECT relation, n_rows, n_orphans,
        |  round(CAST(n_orphans AS DOUBLE) / n_rows, 6) AS orphan_rate
        |FROM u ORDER BY relation""".stripMargin)),
    QueryDef("ts7_holt_winters", (s, d) => holtWintersSmoothing(s, d), Some(
      """WITH RECURSIVE daily AS (
        |  SELECT o_orderdate AS day,
        |    CAST(round(round(sum(o_totalprice), 2) * 100, 0) AS BIGINT) * 10000 AS xs
        |  FROM orders GROUP BY 1),
        |idx AS (SELECT day, xs, row_number() OVER (ORDER BY day) AS t FROM daily),
        |rec AS (
        |  SELECT t, day, xs, xs AS lvl, CAST(0 AS BIGINT) AS trd,
        |    [CAST(0 AS BIGINT), 0, 0, 0, 0, 0, 0] AS seas
        |  FROM idx WHERE t = 1
        |  UNION ALL
        |  SELECT i.t, i.day, i.xs,
        |    (i.xs - r.seas[1] + 4 * (r.lvl + r.trd)) // 5,
        |    (((i.xs - r.seas[1] + 4 * (r.lvl + r.trd)) // 5) - r.lvl + 9 * r.trd) // 10,
        |    list_append(r.seas[2:7],
        |      ((i.xs - ((i.xs - r.seas[1] + 4 * (r.lvl + r.trd)) // 5)) + 4 * r.seas[1]) // 5)
        |  FROM idx i JOIN rec r ON i.t = r.t + 1)
        |SELECT strftime(day, '%Y-%m-%d') AS day, xs // 10000 AS rev_cents,
        |  lvl AS level_u, trd AS trend_u, seas[7] AS season_u,
        |  lvl + trd + seas[1] AS forecast_u
        |FROM rec ORDER BY day""".stripMargin)),
    QueryDef("dq8_benford_audit", (s, d) => benfordAudit(s, d), Some(
      """WITH d AS (
        |  SELECT CAST(substr(CAST(CAST(round(round(o_totalprice, 2) * 100, 0) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM orders),
        |g AS (SELECT digit, count(*) AS n FROM d WHERE digit BETWEEN 1 AND 9 GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM g)
        |SELECT digit, n,
        |  round(n / CAST(total AS DOUBLE), 6) AS observed_share,
        |  round(log10(1 + 1.0 / digit), 6) AS expected_share,
        |  round(pow(n - total * log10(1 + 1.0 / digit), 2)
        |    / (total * log10(1 + 1.0 / digit)), 6) AS chi2_term
        |FROM g CROSS JOIN t ORDER BY digit""".stripMargin)),
    QueryDef("ts6_theil_sen", (s, d) => theilSenTrend(s, d), Some(
      """WITH daily0 AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(round(round(sum(o_totalprice), 2) * 100, 0) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |mx AS (SELECT max(day) AS dmax FROM daily0),
        |daily AS (
        |  SELECT day, cents FROM daily0 CROSS JOIN mx
        |  WHERE date_diff('day', day, dmax) < 365),
        |p AS (
        |  SELECT (b.cents - a.cents) / CAST(date_diff('day', a.day, b.day) AS DOUBLE) AS slope
        |  FROM daily a JOIN daily b ON b.day > a.day),
        |m AS (SELECT quantile_cont(slope, 0.5) AS m, CAST(count(*) AS BIGINT) AS n_pairs FROM p),
        |f AS (SELECT min(day) AS day0, count(*) AS n_days FROM daily),
        |r AS (
        |  SELECT cents - m.m * date_diff('day', f.day0, daily.day) AS r,
        |    m.m AS m, f.n_days AS n_days, m.n_pairs AS n_pairs
        |  FROM daily CROSS JOIN m CROSS JOIN f)
        |SELECT max(n_days) AS n_days, max(n_pairs) AS n_pairs,
        |  round(max(m), 6) AS slope_cents_per_day,
        |  round(quantile_cont(r, 0.5), 4) AS intercept_cents
        |FROM r""".stripMargin)),
    QueryDef("dq7_freshness_sla", (s, d) => freshnessAudit(s, d), Some(
      """WITH ev AS (SELECT event_type, ts, epoch_us(ts) AS us FROM events),
        |g AS (SELECT max(us) AS glob_us FROM ev)
        |SELECT event_type, count(*) AS n_events,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
        |  (max(glob_us) - max(us)) // 3600000000 AS lag_hours,
        |  count(CASE WHEN us > glob_us - 86400000000 THEN 1 END) AS n_last_24h,
        |  CAST((max(glob_us) - max(us)) // 3600000000 >= 4 AS INT) AS stale
        |FROM ev CROSS JOIN g
        |GROUP BY 1 ORDER BY 1""".stripMargin)),
    QueryDef("ts5_holt_smoothing", (s, d) => holtSmoothing(s, d), Some(
      """WITH RECURSIVE daily AS (
        |  SELECT o_orderdate AS day,
        |    CAST(round(round(sum(o_totalprice), 2) * 100, 0) AS BIGINT) * 10000 AS xs
        |  FROM orders GROUP BY 1),
        |idx AS (SELECT day, xs, row_number() OVER (ORDER BY day) AS t FROM daily),
        |rec AS (
        |  SELECT t, day, xs, xs AS lvl, CAST(0 AS BIGINT) AS trd
        |  FROM idx WHERE t = 1
        |  UNION ALL
        |  SELECT i.t, i.day, i.xs,
        |    (i.xs + 4 * (r.lvl + r.trd)) // 5,
        |    (((i.xs + 4 * (r.lvl + r.trd)) // 5) - r.lvl + 9 * r.trd) // 10
        |  FROM idx i JOIN rec r ON i.t = r.t + 1)
        |SELECT strftime(day, '%Y-%m-%d') AS day, xs // 10000 AS rev_cents,
        |  lvl AS level_u, trd AS trend_u, lvl + trd AS forecast_u
        |FROM rec ORDER BY day""".stripMargin)),
    QueryDef("ts4_cusum_changepoint", (s, d) => cusumChangepoint(s, d), Some(
      """WITH daily AS (
        |  SELECT o_orderdate AS day,
        |    CAST(round(round(sum(o_totalprice), 2) * 100, 0) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT count(*) AS n_days, sum(cents) AS total_cents FROM daily),
        |c AS (
        |  SELECT day, row_number() OVER (ORDER BY day) AS t,
        |    sum(cents) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM daily)
        |SELECT strftime(day, '%Y-%m-%d') AS day, n_days,
        |  CAST(abs(n_days * cum - t * total_cents) AS BIGINT) AS abs_dev
        |FROM c CROSS JOIN tot
        |ORDER BY abs_dev DESC, day DESC LIMIT 1""".stripMargin)),
    QueryDef("ts3_stl_decompose", (s, d) => stlDecompose(s, d), Some(
      """WITH daily AS (
        |  SELECT date_trunc('day', o_orderdate) AS day,
        |    round(sum(o_totalprice), 2) AS rev
        |  FROM orders GROUP BY 1),
        |t AS (
        |  SELECT day, rev,
        |    round(avg(rev) OVER (ORDER BY day
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING), 4) AS trend,
        |    dayofweek(day) AS dow
        |  FROM daily),
        |d2 AS (SELECT *, rev - trend AS detr FROM t),
        |se AS (SELECT dow, round(avg(detr), 4) AS seasonal FROM d2 GROUP BY 1)
        |SELECT strftime(day, '%Y-%m-%d') AS day, rev, trend, seasonal,
        |  round(detr - seasonal, 4) AS residual
        |FROM d2 JOIN se USING (dow)
        |ORDER BY day""".stripMargin)),
    QueryDef("dq10_psi_drift", (s, d) => psiDrift(s, d), Some(
      """WITH ev AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS c, epoch_ms(ts) AS ms
        |  FROM events),
        |b AS (SELECT min(ms) AS lo, max(ms) AS hi FROM ev),
        |h AS (
        |  SELECT c, CAST(ms * 2 > lo + hi AS INT) AS late
        |  FROM ev CROSS JOIN b),
        |cuts AS (
        |  SELECT quantile_cont(c, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS cuts
        |  FROM h WHERE late = 0),
        |binned AS (
        |  SELECT CAST(len(list_filter(cuts, x -> c > x)) AS INT) AS bin,
        |    CAST(sum(CASE WHEN late = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN late = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM h CROSS JOIN cuts GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(n_a) AS BIGINT) AS ta, CAST(sum(n_b) AS BIGINT) AS tb
        |  FROM binned),
        |x AS (
        |  SELECT bin, n_a, n_b,
        |    greatest(CAST(n_a AS DOUBLE) / ta, 1e-6) AS share_a,
        |    greatest(CAST(n_b AS DOUBLE) / tb, 1e-6) AS share_b
        |  FROM binned CROSS JOIN tot)
        |SELECT bin, n_a, n_b,
        |  round(share_a, 6) AS share_a, round(share_b, 6) AS share_b,
        |  round((share_b - share_a) * ln(share_b / share_a), 6) AS psi_contrib
        |FROM x ORDER BY bin""".stripMargin)),
    QueryDef("dq5_category_drift", (s, d) => categoryDrift(s, d), Some(
      """WITH ev AS (SELECT event_type, epoch_ms(ts) AS ms FROM events),
        |b AS (SELECT min(ms) AS lo, max(ms) AS hi FROM ev),
        |per AS (
        |  SELECT event_type,
        |    CAST(sum(CASE WHEN ms * 2 > lo + hi THEN 0 ELSE 1 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN ms * 2 > lo + hi THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM ev CROSS JOIN b GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(n_a) AS BIGINT) AS ta, CAST(sum(n_b) AS BIGINT) AS tb
        |  FROM per),
        |x AS (
        |  SELECT event_type, n_a, n_b, ta, tb,
        |    CAST(n_a AS DOUBLE) / ta AS share_a,
        |    CAST(n_b AS DOUBLE) / tb AS share_b,
        |    CAST(n_a + n_b AS DOUBLE) / (ta + tb) AS pooled
        |  FROM per CROSS JOIN tot)
        |SELECT event_type, n_a, n_b,
        |  round(share_a, 6) AS share_a, round(share_b, 6) AS share_b,
        |  round(pow(n_a - pooled * ta, 2) / (pooled * ta)
        |      + pow(n_b - pooled * tb, 2) / (pooled * tb), 6) AS chi2_contrib,
        |  CAST(abs(share_a - share_b) > 0.01 AS INT) AS drifted
        |FROM x ORDER BY event_type""".stripMargin)),
    QueryDef("ts2_seasonal_backtest", (s, d) => seasonalBacktest(s, d), Some(
      """WITH daily AS (
        |  SELECT date_trunc('day', o_orderdate) AS day,
        |    round(sum(o_totalprice), 2) AS rev
        |  FROM orders GROUP BY 1),
        |mx AS (SELECT max(day) AS mx FROM daily),
        |lab AS (
        |  SELECT day, rev, day > mx - INTERVAL 7 DAY AS is_test,
        |    dayofweek(day) AS dow
        |  FROM daily CROSS JOIN mx),
        |f AS (
        |  SELECT dow, round(avg(rev), 4) AS forecast
        |  FROM lab WHERE NOT is_test GROUP BY 1)
        |SELECT strftime(day, '%Y-%m-%d') AS day, rev AS actual, forecast,
        |  round(abs(rev - forecast) / rev, 6) AS ape
        |FROM lab JOIN f USING (dow)
        |WHERE is_test ORDER BY day""".stripMargin)),
    QueryDef("dq9_l_diversity", (s, d) => lDiversity(s, d), Some(
      """SELECT CAST(c_nationkey AS VARCHAR) AS nation,
        |  c_mktsegment AS segment,
        |  count(*) AS n,
        |  CAST(count(DISTINCT
        |    CAST(round(round(c_acctbal, 2) * 100, 0) AS BIGINT) // 200000)
        |    AS BIGINT) AS n_bands,
        |  CAST(count(DISTINCT
        |    CAST(round(round(c_acctbal, 2) * 100, 0) AS BIGINT) // 200000)
        |    >= 3 AS INT) AS diverse
        |FROM customer GROUP BY 1, 2 ORDER BY nation, segment""".stripMargin)),
    QueryDef("dq4_k_anonymity", (s, d) => kAnonymity(s, d), Some(
      """WITH g AS (
        |  SELECT CAST(c_nationkey AS VARCHAR) AS nation,
        |         c_mktsegment AS segment,
        |         count(*) AS n, sum(c_acctbal) AS bal
        |  FROM customer GROUP BY 1, 2),
        |rel AS (
        |  SELECT nation, segment, n, bal FROM g WHERE n >= 10
        |  UNION ALL
        |  SELECT '*', '*', CAST(sum(n) AS BIGINT), sum(bal)
        |  FROM g WHERE n < 10 HAVING sum(n) IS NOT NULL)
        |SELECT nation, segment, n, round(bal / n, 2) AS avg_acctbal
        |FROM rel ORDER BY nation, segment""".stripMargin)),
    QueryDef("dq3_reconciliation", (s, d) => reconcileOrders(s, d), Some(
      """WITH lt AS (
        |  SELECT l_orderkey AS o_orderkey,
        |    round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
        |      AS line_total
        |  FROM lineitem GROUP BY 1),
        |j AS (
        |  SELECT o.o_orderstatus, lt.line_total,
        |    round(abs(o.o_totalprice - coalesce(lt.line_total, 0)), 2) AS drift
        |  FROM orders o LEFT JOIN lt USING (o_orderkey))
        |SELECT o_orderstatus, count(*) AS n_orders,
        |  count(*) FILTER (line_total IS NULL) AS n_lineless,
        |  count(*) FILTER (drift > 1.0) AS n_drifted,
        |  round(max(drift), 2) AS max_drift,
        |  round(avg(drift), 2) AS avg_drift
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin)),
    QueryDef("dq2_mad_outliers", (s, d) => madOutliers(s, d), Some(
      """WITH daily AS (
        |  SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS day,
        |    round(sum(o_totalprice), 2) AS rev
        |  FROM orders GROUP BY 1, 2),
        |med AS (
        |  SELECT prio, quantile_cont(rev, 0.5) AS med FROM daily GROUP BY 1),
        |dev AS (
        |  SELECT d.prio, d.day, d.rev, m.med, abs(d.rev - m.med) AS absdev
        |  FROM daily d JOIN med m USING (prio)),
        |mad AS (
        |  SELECT prio, quantile_cont(absdev, 0.5) AS mad FROM dev GROUP BY 1)
        |SELECT v.prio, v.day, v.rev,
        |  CASE WHEN a.mad > 0
        |    THEN round((v.rev - v.med) / (1.4826 * a.mad), 4) END AS robust_z
        |FROM dev v JOIN mad a USING (prio)
        |WHERE v.absdev > 3.0 * 1.4826 * a.mad
        |ORDER BY 1, 2""".stripMargin)),
    QueryDef("a12_median_mode", medianMode, Some(
      """WITH med AS (
        |  SELECT o_orderpriority, count(*) AS n,
        |    round(quantile_cont(o_totalprice, 0.5), 4) AS median_price
        |  FROM orders GROUP BY 1),
        |c AS (
        |  SELECT o_orderpriority, o_orderdate, count(*) AS cnt
        |  FROM orders GROUP BY 1, 2),
        |m AS (
        |  SELECT o_orderpriority, o_orderdate AS mode_date,
        |    CAST(cnt AS BIGINT) AS mode_n,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY cnt DESC, o_orderdate ASC) AS rn
        |  FROM c)
        |SELECT med.o_orderpriority, med.n, med.median_price,
        |  m.mode_date, m.mode_n
        |FROM med JOIN m USING (o_orderpriority)
        |WHERE m.rn = 1 ORDER BY 1""".stripMargin)),
    QueryDef("dq6_expectation_suite", expectationSuite, Some(
      """WITH o AS (
        |  SELECT count(*) AS n,
        |    count(*) FILTER (o_totalprice IS NULL OR o_totalprice <= 0) AS r1,
        |    count(*) FILTER (CAST(o_orderdate AS DATE) < DATE '1992-01-01'
        |      OR CAST(o_orderdate AS DATE) > DATE '2002-12-31') AS r2,
        |    count(*) FILTER (o_orderstatus NOT IN ('O', 'F', 'P')) AS r3,
        |    count(*) - count(DISTINCT o_orderkey) AS r4
        |  FROM orders),
        |l AS (
        |  SELECT count(*) AS n,
        |    count(*) FILTER (l_quantity IS NULL OR l_quantity <= 0
        |      OR l_quantity > 1000) AS r1,
        |    count(*) FILTER (l_discount < 0 OR l_discount > 0.1) AS r2,
        |    count(*) FILTER (l_tax < 0 OR l_tax > 0.08) AS r3,
        |    count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS r4
        |  FROM lineitem),
        |c AS (
        |  SELECT count(*) AS n,
        |    count(*) - count(DISTINCT c_custkey) AS r1,
        |    count(*) FILTER (c_acctbal IS NULL) AS r2,
        |    count(*) FILTER (c_mktsegment NOT IN ('AUTOMOBILE', 'BUILDING',
        |      'FURNITURE', 'MACHINERY', 'HOUSEHOLD')) AS r3
        |  FROM customer),
        |rep AS (
        |  SELECT 'orders' AS tbl, 'totalprice_positive' AS rule_id,
        |    n AS n_rows, r1 AS n_viol FROM o
        |  UNION ALL SELECT 'orders', 'orderdate_window', n, r2 FROM o
        |  UNION ALL SELECT 'orders', 'status_domain', n, r3 FROM o
        |  UNION ALL SELECT 'orders', 'orderkey_unique', n, r4 FROM o
        |  UNION ALL SELECT 'lineitem', 'quantity_range', n, r1 FROM l
        |  UNION ALL SELECT 'lineitem', 'discount_range', n, r2 FROM l
        |  UNION ALL SELECT 'lineitem', 'tax_range', n, r3 FROM l
        |  UNION ALL SELECT 'lineitem', 'pk_unique', n, r4 FROM l
        |  UNION ALL SELECT 'customer', 'custkey_unique', n, r1 FROM c
        |  UNION ALL SELECT 'customer', 'acctbal_not_null', n, r2 FROM c
        |  UNION ALL SELECT 'customer', 'mktsegment_domain', n, r3 FROM c)
        |SELECT tbl, rule_id, n_rows, CAST(n_viol AS BIGINT) AS n_viol,
        |  CAST(CASE WHEN n_viol = 0 THEN 1 ELSE 0 END AS INT) AS pass
        |FROM rep ORDER BY tbl, rule_id""".stripMargin)),
    QueryDef("dq1_quality_profile", qualityProfile, Some(
      """WITH base AS (
        |  SELECT count(*) AS n_rows,
        |    count(*) FILTER (l_quantity IS NULL) AS null_qty,
        |    count(*) FILTER (l_quantity <= 0 OR l_quantity > 1000) AS qty_range_viol,
        |    count(*) FILTER (l_discount < 0 OR l_discount > 1) AS discount_viol,
        |    count(*) FILTER (l_extendedprice <= 0) AS price_viol
        |  FROM lineitem),
        |dup AS (
        |  SELECT CAST(coalesce(sum(cnt - 1) FILTER (cnt > 1), 0) AS BIGINT)
        |    AS dup_pk_rows
        |  FROM (SELECT count(*) AS cnt FROM lineitem
        |        GROUP BY l_orderkey, l_linenumber)),
        |lo AS (
        |  SELECT count(*) AS orphan_orderkeys FROM (
        |    SELECT DISTINCT l_orderkey FROM lineitem
        |    WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))),
        |co AS (
        |  SELECT count(*) AS orphan_custkeys FROM (
        |    SELECT DISTINCT o_custkey FROM orders
        |    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)))
        |SELECT * FROM base, dup, lo, co""".stripMargin)),
    QueryDef("ts1_ewma", ewmaDaily, Some(
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, sum(value) AS x
        |  FROM events GROUP BY 1, 2),
        |d2 AS (
        |  SELECT user_id, x,
        |    max(day - DATE '1970-01-01') OVER (PARTITION BY user_id)
        |      - (day - DATE '1970-01-01') AS span
        |  FROM daily)
        |SELECT user_id, count(*) AS n_days,
        |  round(sum(x * power(0.8, span)) / sum(power(0.8, span)), 4) AS ewma
        |FROM d2 GROUP BY 1 ORDER BY 1""".stripMargin)))
}
