package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Second wave of relational surface: grouping sets (CUBE), exact
  * percentiles, PIVOT, as-of join, range/band join, correlated scalar
  * subqueries, array-function surface, and the typed-Aggregator UDAF.
  *
  * Scale notes per operator are on each method — the common thread: each
  * query is one shuffle (or none beyond the scan) and every join is either
  * broadcast-by-construction (tiny dim) or a single co-partitioned
  * shuffle.
  */
object Analytics {
  import Tables._

  /** CUBE over (returnflag, linestatus): 2ⁿ grouping sets in one pass —
    * Spark expands to a single Expand + hash-agg (no re-scan per set).
    */
  def cubeFlags(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .cube("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("n"),
        round(sum("l_quantity"), 4).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_price"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** Arbitrary GROUPING SETS — the general form a5's CUBE and a2's ROLLUP
    * specialize: the user picks exactly which aggregation shapes to
    * compute ((flag,status), (flag), ()) and Spark expands them in ONE
    * pass over the scan (a single Expand + hash-agg — not one re-scan
    * per set, which is what a naive UNION ALL of three GROUP BYs costs).
    * Declared through the SQL front-end: GROUPING SETS has no DataFrame
    * verb, and the view IS the same Catalyst plan.
    */
  def groupingSetsFlags(s: SparkSession, d: String): DataFrame = {
    lineitem(s, d).createOrReplaceTempView("graft_gs_lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 4) AS sum_qty
        |FROM graft_gs_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  /** Exact percentiles (continuous interpolation) per group. Spark's
    * `percentile` matches DuckDB's quantile_cont; at 100 TB you'd switch
    * to approx_percentile (t-digest) — both are declared here.
    */
  def percentilesByPriority(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        round(expr("percentile(o_totalprice, 0.25)"), 4).as("p25"),
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.75)"), 4).as("p75"))
      .orderBy("o_orderpriority")

  /** PIVOT: market segments to columns. The value list is explicit —
    * without it Spark runs a driver-side distinct first (an extra job).
    */
  def pivotSegments(s: SparkSession, d: String): DataFrame = {
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .pivot("c_mktsegment", segs)
      .count()
      .na.fill(0L, segs)
      .orderBy("n_name")
  }

  /** One oracle for both as-of forms (j6 window composition, j12 custom
    * physical operator): DuckDB's native ASOF LEFT JOIN.
    */
  val asofOracle: String =
    """WITH o AS (
      |  SELECT o_custkey AS user_id, o_orderdate AS ots,
      |    max(o_orderkey) AS ok, arg_max(o_totalprice, o_orderkey) AS price
      |  FROM orders GROUP BY 1, 2)
      |SELECT e.event_id, e.user_id, o.ok AS last_orderkey,
      |  round(o.price, 2) AS last_price
      |FROM events e ASOF LEFT JOIN o
      |  ON e.user_id = o.user_id AND e.ts >= o.ots
      |ORDER BY e.event_id""".stripMargin

  /** j12 — the same as-of semantics as [[asofLastOrder]] (j6), computed
    * by the CUSTOM PHYSICAL OPERATOR (`graft.plans.AsOfJoinExec`: one
    * forward-merge pass per co-partition, O(1) state) instead of the
    * union + last_value window composition. Shares j6's oracle verbatim
    * — operator ≡ composition ≡ SQL ASOF JOIN, hash-verified. Both order
    * rows per (cust, date) are pre-deduped, so within-key time ties
    * cannot occur and the merge's tie-keep-last is never exercised
    * (the composed form needs the same dedup for the same reason).
    */
  def asofNativeLastOrder(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
      .groupBy(col("o_custkey").as("o_user"), col("o_orderdate").as("ots"))
      .agg(
        max("o_orderkey").as("ok"),
        max_by(col("o_totalprice"), col("o_orderkey")).as("price"))
    val e = events(s, d).select(col("event_id"), col("user_id"), col("ts"))
    graft.plans.AsOf.join(e, o, "user_id", "o_user", "ts", "ots")
      .select(col("event_id"), col("user_id"),
        col("ok").as("last_orderkey"),
        round(col("price"), 2).as("last_price"))
      .orderBy("event_id")
  }

  /** As-of join (each event ↔ most recent order of that customer at or
    * before the event): the union + partitioned last-non-null window
    * pattern — ONE shuffle on the key, no range-explosion, no
    * per-row subquery. This is how as-of scales: the naive
    * join-then-filter-then-rank form shuffles |events|×|orders per key|
    * rows; this shuffles |events|+|orders|.
    * Orders are deduped per (cust, date) first so tie-breaking is
    * deterministic on both engines.
    */
  def asofLastOrder(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
      .groupBy(col("o_custkey").as("user_id"), col("o_orderdate").as("ts"))
      .agg(
        max("o_orderkey").as("ok"),
        max_by(col("o_totalprice"), col("o_orderkey")).as("price"))
      .select(
        lit(null).cast("bigint").as("event_id"), col("user_id"), col("ts"),
        lit(0).as("src"), col("ok"), col("price"))
    val e = events(s, d).select(
      col("event_id"), col("user_id"), col("ts"),
      lit(1).as("src"), lit(null).cast("bigint").as("ok"),
      lit(null).cast("double").as("price"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("src"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.unionByName(o)
      .withColumn("last_orderkey", last("ok", ignoreNulls = true).over(w))
      .withColumn("last_price", round(last("price", ignoreNulls = true).over(w), 2))
      .filter(col("src") === 1)
      .select("event_id", "user_id", "last_orderkey", "last_price")
      .orderBy("event_id")
  }

  /** Range/band join: orders against an inline price-band dim. The band
    * table is broadcast (nested-loop with 5 rows ≡ free); the equivalent
    * at scale keeps the dim broadcast so the fact side never shuffles.
    */
  def bandJoinPriceTiers(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bands = Seq(
      ("t1_budget", 0.0, 50000.0),
      ("t2_low", 50000.0, 150000.0),
      ("t3_mid", 150000.0, 300000.0),
      ("t4_high", 300000.0, 450000.0),
      ("t5_top", 450000.0, Double.MaxValue)).toDF("tier", "lo", "hi")
    orders(s, d)
      .join(broadcast(bands), col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy("tier")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("revenue"))
      .orderBy("tier")
  }

  /** q2 — LATERAL correlated subquery through the SQL front-end: top-3
    * customers by balance per nation, written the way an analyst writes
    * it (a per-row dependent subquery with ORDER BY + LIMIT). Catalyst
    * DECORRELATES this into a window rank over one partitioned exchange
    * — no per-nation re-scan survives in the physical plan; declared to
    * keep that rewrite exercised alongside q1's scalar form.
    */
  def lateralTopPerNation(s: SparkSession, d: String): DataFrame = {
    customer(s, d).createOrReplaceTempView("graft_lat_cust")
    nation(s, d).createOrReplaceTempView("graft_lat_nation")
    s.sql(
      """SELECT n_name, c_custkey, bal
        |FROM graft_lat_nation,
        |LATERAL (SELECT c_custkey, round(c_acctbal, 2) AS bal
        |         FROM graft_lat_cust WHERE c_nationkey = n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 3)
        |ORDER BY n_name, bal DESC, c_custkey""".stripMargin)
  }

  /** Correlated scalar subquery through the SQL front-end: customers whose
    * balance beats their nation's average. Catalyst decorrelates this into
    * an aggregate + join — pinned here so the rewrite stays exercised.
    */
  def aboveNationAvg(s: SparkSession, d: String): DataFrame = {
    customer(s, d).createOrReplaceTempView("graft_cust_sq")
    s.sql(
      """SELECT c_custkey, round(c_acctbal, 2) AS bal
        |FROM graft_cust_sq o
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM graft_cust_sq i
        |                   WHERE i.c_nationkey = o.c_nationkey)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** q5 — recursive CTE hierarchy walk (Spark 4's WITH RECURSIVE →
    * UnionLoop): every part climbs the deterministic binary tree
    * parent(k) = k DIV 2, rolling up path depth, ancestor count, and the
    * ancestor-chain retail cost in exact integer cents. The BOM-explosion
    * / org-chart shape SQL engines express only through recursion —
    * declared through the front-end so the recursion is Catalyst's to
    * execute (each level is one distributed join, recursion depth =
    * log₂(max key) ≈ 20 at any realistic key space, never data-sized).
    * DuckDB runs the identical recursion — an engine-level
    * cross-validation of the new UnionLoop operator.
    */
  def recursiveHierarchy(s: SparkSession, d: String): DataFrame = {
    val vn = s"graft_part_rec_${Tables.scratchTag(d)}"
    part(s, d).createOrReplaceTempView(vn)
    s.sql(
      s"""WITH RECURSIVE walk(part, node, depth) AS (
         |  SELECT p_partkey, p_partkey, 0 FROM $vn
         |  UNION ALL
         |  SELECT part, node DIV 2, depth + 1 FROM walk WHERE node > 1)
         |SELECT w.part AS p_partkey, max(w.depth) AS depth,
         |  count(*) AS n_ancestors,
         |  CAST(sum(CAST(round(round(p.p_retailprice, 2) * 100, 0) AS BIGINT)) AS BIGINT) AS path_cost_cents
         |FROM walk w JOIN $vn p ON w.node = p.p_partkey
         |GROUP BY w.part ORDER BY p_partkey""".stripMargin)
  }

  /** Array-function surface over tokenized part names: size, distinct,
    * sort, slice, reverse — all codegen'd collection expressions.
    */
  def arrayFuncs(s: SparkSession, d: String): DataFrame = {
    val toks = split(col("p_name"), " ")
    part(s, d).select(
      col("p_partkey"),
      size(toks).cast("bigint").as("n_tokens"),
      size(array_distinct(toks)).cast("bigint").as("n_distinct"),
      concat_ws(",", array_sort(toks)).as("sorted_toks"),
      concat_ws(",", slice(toks, 1, 2)).as("first2"),
      concat_ws(",", reverse(toks)).as("reversed"),
      element_at(toks, -1).as("last_tok"))
      .orderBy("p_partkey")
  }

  /** O2's literal sparse-vector-sum semantics as a typed
    * Aggregator[IN, BUF, OUT] (graft.functions.SparseVectorSum): duplicate
    * item keys sum into one sparse vector per user; surfaced as
    * (n_items, checksum) so the result is oracle-able.
    */
  def vectorSumAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ds = lineitem(s, d)
      .select(
        col("l_suppkey").cast("long").as("user_id"),
        col("l_partkey").cast("long").as("item"),
        col("l_quantity").as("q"))
      .as[(Long, Long, Double)]
    ds.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(graft.functions.SparseVectorSum.toColumn.name("vec"))
      .select(
        col("key").as("user_id"),
        size(map_keys(col("vec"))).cast("bigint").as("n_items"),
        round(aggregate(map_values(col("vec")), lit(0.0d), (a, x) => a + x), 4).as("vec_sum"))
      .orderBy("user_id")
  }

  /** Typed JSON parsing of the events payload: `from_json` with an
    * explicit schema (vs f4's regex extraction) — the codegen'd Jackson
    * path, no inference pass.
    */
  def jsonParse(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("j", from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        min(col("j.k")).as("min_k"),
        max(col("j.k")).as("max_k"),
        round(avg(col("j.k")), 6).as("avg_k"))
      .orderBy("event_type")

  /** The rest of the ranking-window family in one query: ntile,
    * percent_rank, cume_dist, first_value, lag/lead with offsets —
    * unique (price, key) ordering so every function is deterministic.
    */
  def windowZoo(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    orders(s, d).select(
      col("o_orderpriority"), col("o_orderkey"),
      ntile(4).over(w).as("quartile"),
      round(percent_rank().over(w), 6).as("pct_rank"),
      round(cume_dist().over(w), 6).as("cume"),
      first("o_orderkey").over(w).as("first_key"),
      lag("o_orderkey", 2).over(w).as("lag2"),
      lead("o_orderkey", 2).over(w).as("lead2"))
      .orderBy("o_orderpriority", "o_orderkey")
  }

  /** Column profiling — the data-quality pass every training pipeline
    * runs before ingest: per-column row/null/distinct counts + numeric
    * range. One union of column-pruned single-column aggregates (each
    * scan reads exactly one column).
    */
  def columnStats(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    def stats(cname: String) =
      o.agg(
        count(lit(1)).as("n"),
        (count(lit(1)) - count(col(cname))).as("n_null"),
        countDistinct(col(cname)).as("n_distinct"),
        round(min(col(cname)).cast("double"), 4).as("min_val"),
        round(max(col(cname)).cast("double"), 4).as("max_val"))
        .select(lit(cname).as("column"), col("*"))
    Seq("o_orderkey", "o_custkey", "o_totalprice")
      .map(stats).reduce(_ unionByName _)
      .orderBy("column")
  }

  /** Sliding event-time window aggregation via a RANGE frame: per
    * customer, the 30-day trailing revenue at each order. RANGE frames
    * are value-based, so tied order dates share one frame — no
    * total-order requirement (unlike ROWS running sums) and the result is
    * deterministic by construction. The time axis is epoch days (Spark's
    * rangeBetween is numeric); one shuffle + sort per partition key.
    */
  def slidingRevenue(s: SparkSession, d: String, windowDays: Int = 30): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("day")
      .rangeBetween(-windowDays.toLong, 0L)
    orders(s, d)
      .withColumn("day", datediff(col("o_orderdate"), lit("1990-01-01")).cast("long"))
      .withColumn("rev30", round(sum("o_totalprice").over(w), 2))
      .select("o_custkey", "o_orderkey", "day", "rev30")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Top-k per group via the bounded [[graft.functions.TopK]] Aggregator —
    * the scale-path alternative to w1's window row_number: map tasks
    * reduce each group slice to ≤ k pairs BEFORE the shuffle (two-phase
    * ObjectHashAggregate), so shuffle volume is O(groups·k), not O(rows),
    * and no global sort happens. Same total order as the window form
    * (score desc, id asc) → oracled with w1's own SQL.
    */
  def topKAgg(s: SparkSession, d: String, k: Int = 3): DataFrame =
    graft.functions.TopK.perGroup(
      orders(s, d).select(col("o_custkey"), col("o_totalprice"), col("o_orderkey")),
      "o_custkey", "o_totalprice", "o_orderkey", k, rankCol = "rn")
      .orderBy("o_custkey", "rn")

  /** Fixed-bin histogram: pure-arithmetic bucketing (floor division on
    * literal bounds — no engine-specific width_bucket) + one aggregation.
    * The shape of every distribution dashboard at scale: the map side
    * reduces each partition to ≤ nbins partials.
    */
  def histogram(s: SparkSession, d: String, binWidth: Double = 25000.0): DataFrame =
    orders(s, d)
      .withColumn("bucket", floor(col("o_totalprice") / binWidth).cast("int"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("sum_price"))
      .orderBy("bucket")

  /** Bivariate statistics: Pearson correlation + sample/population
    * covariance of (quantity, extendedprice) in one pass. Co-moment
    * accumulators merge associatively — the distributed shape; corr is
    * scale-free so 6-decimal rounding is fp-merge-safe, covariances round
    * at 2 (their magnitude makes tighter rounding oversensitive to
    * partition merge order).
    */
  def bivariateStats(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).agg(
      count(lit(1)).as("n"),
      round(corr("l_quantity", "l_extendedprice"), 6).as("corr_qty_price"),
      round(covar_samp("l_quantity", "l_extendedprice"), 2).as("covar_samp_qp"),
      round(covar_pop("l_quantity", "l_extendedprice"), 2).as("covar_pop_qp"))

  /** a13 — several COUNT(DISTINCT …) on DIFFERENT columns beside plain
    * aggregates, one logical pass: Catalyst rewrites multi-distinct via
    * Expand (each row replicated once per distinct group with the others
    * nulled), so the whole thing is two hash aggregations over the
    * expanded stream — no per-distinct re-scan of the fact table, which
    * at 100 TB is the difference between one read and three. (a4 covers
    * the sketch alternative when exactness is negotiable.)
    */
  def multiDistinct(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        countDistinct("l_partkey").as("n_parts"),
        countDistinct("l_suppkey").as("n_supps"),
        countDistinct("l_orderkey").as("n_orders"),
        count(lit(1)).as("n_rows"),
        round(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy("l_returnflag")

  /** a14 — per-group least-squares trend (regr_slope / regr_intercept /
    * regr_r2): revenue-vs-time trend per market segment, the "is this
    * segment growing" query. One hash aggregation — the regression
    * moments (n, Σx, Σy, Σxx, Σxy, Σyy) are algebraic, so partial
    * aggregation runs map-side and the shuffle carries six doubles per
    * group regardless of data size. x is days since a fixed epoch (not
    * raw epoch-days) to keep the normal equations well-conditioned.
    */
  def regrBySegment(s: SparkSession, d: String): DataFrame = {
    val x = datediff(to_date(col("o_orderdate")), lit("1995-01-01"))
      .cast("double")
    orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), x.as("x"), col("o_totalprice").as("y"))
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n"),
        round(regr_slope(col("y"), col("x")), 6).as("slope_per_day"),
        round(regr_intercept(col("y"), col("x")), 2).as("intercept"),
        round(regr_r2(col("y"), col("x")), 6).as("r2"))
      .orderBy("c_mktsegment")
  }

  /** Two-stage salted aggregation — the skew pattern: stage 1 groups on
    * (key, salt) so one hot key spreads over 8 reducers; stage 2 merges
    * the 8 partials. Result is identical to a direct groupBy (sums are
    * associative); only the shuffle shape changes. At this SF the direct
    * form is fine — the query pins the pattern the engine reaches for
    * when a key is hot at 100 TB.
    */
  def saltedAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .withColumn("salt", pmod(col("l_orderkey"), lit(8)))
      .groupBy("l_suppkey", "salt")
      .agg(sum("l_quantity").as("part_sum"), count(lit(1)).as("part_n"))
      .groupBy("l_suppkey")
      .agg(
        round(sum("part_sum"), 4).as("total_qty"),
        sum("part_n").as("n_rows"))
      .orderBy("l_suppkey")

  /** Salted equi-join — the skewed-JOIN mitigation completing the skew
    * triad: prof2 diagnoses, u2 salts an aggregation, this salts a join.
    * The fact side gets a salt in [0, numSalts) (caller-supplied
    * expression — derived from a non-key fact column so a hot key's rows
    * spread over numSalts reducers; NEVER from the key itself, which
    * would re-collapse them); the dim side is exploded numSalts× so every
    * (key, salt) pair still finds its dim row. Join on (key, salt) is
    * then provably row-identical to the plain join on key, but the
    * biggest shuffle partition shrinks by ~numSalts for the hot key. The
    * shuffle_hash hint keeps the demo honest: salting is the tool for
    * exactly the case where the dim is too big to broadcast (AQE
    * skew-join covers sort-merge after the fact; salting fixes the
    * partition layout up front).
    */
  def saltedEquiJoin(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, salt: Column, numSalts: Int): DataFrame = {
    val sf = fact.withColumn("__salt_f", pmod(salt, lit(numSalts)).cast("int"))
    val sd = dim.withColumn("__salt_d",
      explode(sequence(lit(0), lit(numSalts - 1))))
    sf.join(sd.hint("shuffle_hash"),
        sf(factKey) === sd(dimKey) && sf("__salt_f") === sd("__salt_d"))
      .drop("__salt_f", "__salt_d")
  }

  /** Declared salted-join query: lineitem with a planted hot foreign key
    * (every l_orderkey % 3 == 0 row rewires to supplier 1 → one key owns
    * ~1/3 of the fact) joined to supplier via [[saltedEquiJoin]]. Salt is
    * pmod(l_orderkey, 16) — deterministic, key-independent — so the
    * oracle (DuckDB running the PLAIN join) hash-matching is the proof
    * that salting changes only the shuffle shape, never the result.
    */
  def saltedSkewJoin(s: SparkSession, d: String, numSalts: Int = 16): DataFrame = {
    val fact = lineitem(s, d).select(
      when(pmod(col("l_orderkey"), lit(3)) === 0, lit(1L))
        .otherwise(col("l_suppkey")).as("fk"),
      col("l_orderkey"), col("l_extendedprice"))
    val dim = supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
    saltedEquiJoin(fact, "fk", dim, "s_suppkey",
        pmod(col("l_orderkey"), lit(numSalts)), numSalts)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n"),
        round(sum("l_extendedprice"), 2).as("revenue"))
      .orderBy("s_nationkey")
  }

  /** j9 — bloom-prefiltered selective join: the dim side is a filtered
    * slice of orders (top price band); its keys are aggregated into a
    * Bloom sketch (one distributed agg, KB–MB on the driver) and
    * broadcast, so non-matching fact rows die MAP-SIDE before the join's
    * shuffle. At 100 TB this is the difference between shuffling the
    * whole fact table into an SMJ and shuffling ~selectivity·|fact|: a
    * 100M-key Bloom at 1% fpp is ~120 MB — broadcastable where the
    * equivalent hash relation (8+ bytes/key plus table overhead) is not.
    * The exact join then removes the ≤fpp false positives, so output ≡
    * the plain join (the oracle). Spark's AQE runtime bloom
    * (spark.sql.optimizer.runtime.bloomFilter.*) injects this same shape
    * automatically when thresholds align; the explicit operator is
    * deterministic about it. Same sketch-then-exact contract as t11.
    */
  def bloomPrefilterJoin(s: SparkSession, d: String,
      cutoff: Double = 480000.0, fpp: Double = 0.01): DataFrame = {
    val hot = orders(s, d).filter(col("o_totalprice") > cutoff)
      .select("o_orderkey", "o_orderpriority").cache()
    val bloom = hot.stat.bloomFilter("o_orderkey", math.max(hot.count(), 1L), fpp)
    val bc = s.sparkContext.broadcast(bloom)
    // UDF justified: sketch probe has no builtin; runs in the scan stage
    val mightContain = udf((k: Long) => bc.value.mightContainLong(k))
    lineitem(s, d).select("l_orderkey", "l_extendedprice")
      .filter(mightContain(col("l_orderkey")))
      .join(hot, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("revenue"))
      .orderBy("o_orderpriority")
  }

  /** a19 — top-k WITH TIES (`rank() ≤ k`), the boundary semantics
    * row_number top-k (w1/u3) silently drops: every row tied with the
    * k-th keeps its place. On integer-grained quantities the tie set is
    * large, so the difference is real data, not a corner case. Spark 4
    * plans this as a WindowGroupLimit: the rank filter is pushed below
    * the window so each task keeps a bounded prefix instead of fully
    * sorting its partition — the native engine optimization that makes
    * rank-limit affordable at scale (pinned in AnalyticsSpec).
    */
  def topkWithTies(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("l_returnflag").orderBy(desc("l_quantity"))
    lineitem(s, d)
      .withColumn("rk", rank().over(w))
      .filter(col("rk") === 1)
      .groupBy("l_returnflag")
      .agg(round(max("l_quantity"), 4).as("top_qty"),
        count(lit(1)).as("n_tied"))
      .orderBy("l_returnflag")
  }

  /** q3 — scalar subquery in the SELECT list (q1 covers the WHERE
    * position): per customer, their order count and max order price as
    * correlated scalars. Declared through the SQL front-end so Catalyst
    * exercises its SELECT-position decorrelation — the plan is a left
    * outer join against the pre-aggregated orders side, NOT a per-row
    * subquery (that plan shape is what makes correlated scalars viable
    * at 100 TB; the rewrite is Catalyst's, the engine just has to not
    * get in its way).
    */
  def scalarSubqueries(s: SparkSession, d: String): DataFrame = {
    customer(s, d).createOrReplaceTempView("graft_q3_customer")
    orders(s, d).createOrReplaceTempView("graft_q3_orders")
    s.sql(
      """SELECT c_custkey,
        |  (SELECT count(*) FROM graft_q3_orders o
        |   WHERE o.o_custkey = c.c_custkey) AS n_orders,
        |  (SELECT round(max(o_totalprice), 2) FROM graft_q3_orders o
        |   WHERE o.o_custkey = c.c_custkey) AS max_price
        |FROM graft_q3_customer c
        |ORDER BY c_custkey""".stripMargin)
  }

  /** q4 — correlated EXISTS / NOT EXISTS (the membership twins of q3's
    * scalars): suppliers split by whether any of their lineitems was
    * returned (l_returnflag = 'R'), counted per nation. Declared through
    * the SQL front-end so Catalyst decorrelates BOTH predicates to one
    * hash join pair (left semi for EXISTS, left anti for NOT EXISTS) on
    * suppkey — never a per-supplier re-scan of lineitem; the plan shape
    * is pinned in PlanShapeSpec. The anti side is the three-valued-safe
    * one: NOT EXISTS has no NULL trap (unlike NOT IN, covered by j11).
    */
  def existsSplit(s: SparkSession, d: String): DataFrame = {
    supplier(s, d).createOrReplaceTempView("graft_q4_supplier")
    lineitem(s, d).createOrReplaceTempView("graft_q4_lineitem")
    s.sql(
      """SELECT s_nationkey,
        |  count(*) AS n_suppliers,
        |  CAST(sum(CASE WHEN EXISTS (
        |    SELECT 1 FROM graft_q4_lineitem l
        |    WHERE l.l_suppkey = s.s_suppkey AND l.l_returnflag = 'R')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_with_returns,
        |  CAST(sum(CASE WHEN NOT EXISTS (
        |    SELECT 1 FROM graft_q4_lineitem l
        |    WHERE l.l_suppkey = s.s_suppkey AND l.l_returnflag = 'R')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
        |FROM graft_q4_supplier s
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)
  }

  /** f11 — bitwise aggregate surface: BIT_AND / BIT_OR / BIT_XOR over a
    * masked key per group — the flag-accumulation idiom (permission
    * masks, feature-presence bitmaps) that turns "which flags appear in
    * this group" into one codegen'd agg instead of N boolean columns.
    */
  def bitwiseAggs(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderpriority"),
        pmod(col("o_orderkey"), lit(256)).as("m"))
      .groupBy("o_orderpriority")
      .agg(
        expr("bit_and(m)").as("mask_and"),
        expr("bit_or(m)").as("mask_or"),
        expr("bit_xor(m)").as("mask_xor"))
      .orderBy("o_orderpriority")

  /** f10 — MapType surface: per-customer map of priority → order count,
    * built with `map_from_entries` over the sorted struct list and
    * exploded back to flat rows. Build and explode are inverse narrow
    * generators around the hash agg, so the round-trip must equal the
    * plain two-key GROUP BY — the oracle. (The second, per-customer agg
    * runs on already-aggregated (cust, priority) rows — the re-shuffle
    * carries group counts, not orders.)
    */
  def mapRoundtrip(s: SparkSession, d: String): DataFrame = {
    val grouped = orders(s, d)
      .groupBy("o_custkey", "o_orderpriority")
      .agg(count(lit(1)).as("n"))
    grouped
      .groupBy("o_custkey")
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("o_orderpriority"), col("n"))))).as("m"))
      .select(col("o_custkey"),
        explode(col("m")).as(Seq("o_orderpriority", "n")))
      .orderBy("o_custkey", "o_orderpriority")
  }

  /** a17 — re-aggregatable distinct-count rollup via HLL sketches: one
    * pass builds per-(week, day) user sketches; the weekly distinct
    * estimate is a MERGE of the daily sketches (`hll_union_agg`), never
    * a second pass over raw events. This is the pattern that makes
    * distinct counts cheap at 100 TB: materialize sketch cubes once,
    * answer any coarser rollup from the cube (register-max union is
    * commutative and associative, so estimates are deterministic and
    * partitioning-independent — unlike re-scanning). FULLY ORACLED
    * since r18 (r17 verdict #7): the declared row is the EXACT weekly
    * distinct (recomputable in DuckDB) plus the estimate judged
    * in-query as a 3-rsd band BOOLEAN — an estimate drifting out of
    * band flips the column and breaks the hash, while the raw register
    * values (no DuckDB HLL twin) stay spec-pinned in AnalyticsSpec:
    * union-of-dailies ≡ direct weekly sketch, error within the band.
    */
  def hllRollup(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(
      date_trunc("week", col("ts")).as("week"),
      date_trunc("day", col("ts")).as("day"),
      col("user_id"))
    val daily = ev.groupBy("week", "day")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val weeklyEst = daily.groupBy("week")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_users"))
    val weeklyExact = ev.groupBy("week")
      .agg(countDistinct("user_id").as("exact_users"))
    weeklyExact.join(weeklyEst, "week")
      .select(
        date_format(col("week"), "yyyy-MM-dd").as("week"),
        col("exact_users"),
        // band constant note (r19, advice item): the true DataSketches
        // HLL RSE at lgConfigK=12 is ≈ 1.04/√4096 ≈ 0.016, so 0.0408 is
        // a DELIBERATELY loose (~2.5×) sanity band, not the nominal
        // 3-sd interval. The value is part of the declared (oracled)
        // output and st18 pins stream ≡ batch on it, so tightening it is
        // a semantic change — kept as-is and documented here and in
        // streamingHllRollup.
        (abs(col("est_users") - col("exact_users")).cast("double") /
          col("exact_users").cast("double") <= lit(3 * 0.0408))
          .as("est_in_band"))
      .orderBy("week")
  }

  /** a20 — EXACT re-aggregatable distinct-count cube via roaring-style
    * bitmaps: one pass builds per-(week, day, bucket) user bitmaps
    * (`bitmap_bucket_number` shards the id space into 32768-bit pages so
    * no single bitmap outgrows a row); the weekly distinct count is a
    * MERGE — `bitmap_or_agg` per bucket, then `bitmap_count` summed over
    * buckets — never a second pass over raw events. Same cube pattern as
    * a17's HLL but EXACT: bitmap OR is idempotent/commutative/
    * associative, so the merged count equals COUNT(DISTINCT) no matter
    * how the merge tree is shaped, which is why it has a DuckDB twin
    * while a17 is rows-only. At 100 TB this is the dashboard-grade
    * distinct cube for dense int keys: storage ∝ distinct ids / 8 bytes
    * per day, and any coarser rollup (week, month, all-time) ORs
    * day-level pages instead of re-scanning facts. HLL (a17) remains the
    * choice when keys are sparse 64-bit hashes; this is the exact
    * complement for dictionary-encoded ids (o15's output domain).
    */
  def bitmapDistinctRollup(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(
      date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("week"),
      date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
      col("user_id"))
    val daily = ev
      .groupBy(col("week"), col("day"),
        expr("bitmap_bucket_number(user_id)").as("bucket"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(user_id))")
        .as("bm"))
    // the MERGE: weekly page = OR of daily pages, count = sum over pages
    val weekly = daily.groupBy("week", "bucket")
      .agg(expr("bitmap_or_agg(bm)").as("bm"))
    weekly.groupBy("week")
      .agg(sum(expr("bitmap_count(bm)")).as("n_users"))
      .orderBy("week")
  }

  /** a18 — re-aggregatable QUANTILE rollup via a deterministic
    * HDR-style histogram sketch: one pass bins each event's value (in
    * exact integer CENTS) into (octave, 16 linear sub-buckets) — octave
    * = bit length of the cents, both computed in pure integer
    * arithmetic (`length(bin(c))`, shifts, `div`), so the sketch is a
    * deterministic function of the data and, unlike a17's HLL, has an
    * EXACT DuckDB twin. Per-(week, day) bucket counts are the sketch
    * cube; the weekly p50/p95/p99 come from MERGING daily counts (sum —
    * commutative, associative, partitioning-independent) and walking
    * the ≤ |buckets| cumulative histogram, never from a second pass
    * over raw events. Log-linear buckets bound relative error by the
    * sub-bucket width: upper/lower ≤ 1 + 1/16 ≈ 6.25% (pinned vs exact
    * percentiles in AnalyticsSpec, along with merge ≡ direct-weekly).
    * This is the percentile latency-dashboard pattern at 100 TB:
    * materialize day×bucket counts once, answer any coarser quantile
    * rollup from the cube.
    */
  def quantileSketchRollup(s: SparkSession, d: String): DataFrame = {
    val daily = quantileSketchDaily(s, d)
    // the MERGE: weekly buckets = sum of daily buckets
    val weekly = daily.groupBy("week", "bin_id").agg(sum("cnt").as("cnt"))
    quantilesFromBuckets(weekly)
  }

  /** a18's binning, shared with st17's streaming cube so batch and
    * stream sketch IDENTICALLY: adds `bin_id` from a positive BIGINT
    * cents column `c` (octave = bit length, 16 linear sub-buckets —
    * pure integer arithmetic, narrow and streaming-safe).
    */
  private[graft] def withHdrBin(df: DataFrame): DataFrame = df
    .withColumn("e", (length(bin(col("c"))) - 1).cast("int"))
    .withColumn("p2", expr("shiftleft(cast(1 as bigint), e)"))
    .withColumn("bin_id",
      col("e") * 16 + expr("cast(((c - p2) * 16) div p2 as int)"))
    .drop("e", "p2")

  /** The sketch cube: per-(week, day, bucket) counts. */
  private[ops] def quantileSketchDaily(s: SparkSession, d: String): DataFrame =
    withHdrBin(events(s, d).select(
        date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("week"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        expr("cast(round(value * 100) as bigint)").as("c"))
      .filter(col("c") > 0))
      .groupBy("week", "day", "bin_id").agg(count(lit(1)).as("cnt"))

  /** Quantile estimates from merged (week, bin_id, cnt) buckets: the
    * q-quantile is the upper edge of the first bucket whose cumulative
    * count reaches ceil(q·total). Calendar×bucket-sized windows only.
    */
  private[graft] def quantilesFromBuckets(weekly: DataFrame): DataFrame = {
    val wk = Window.partitionBy("week").orderBy("bin_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy("week")
    val cum = weekly
      .withColumn("p2", expr("shiftleft(cast(1 as bigint), bin_id div 16)"))
      .withColumn("est",
        (col("p2") + (col("bin_id") % 16 + 1) * col("p2") / lit(16.0))
          / lit(100.0))
      .withColumn("cum", sum("cnt").over(wk))
      .withColumn("total", sum("cnt").over(tot))
    def qEst(q: Double, name: String) =
      round(min(when(col("cum") >= ceil(lit(q) * col("total")),
        col("est"))), 6).as(name)
    cum.groupBy("week").agg(
        max("total").as("n"),
        qEst(0.5, "p50_est"), qEst(0.95, "p95_est"), qEst(0.99, "p99_est"))
      .orderBy("week")
  }

  /** a16 — share-of-total (ratio_to_report): each priority class's
    * revenue as a fraction of the global total. The naive spelling is
    * `sum() OVER ()` — an empty-partition window that drags every fact
    * row through one task. Scale shape: per-group aggregate first (one
    * exchange over |groups| partials), global total re-aggregated from
    * those PARTIALS (algebraic — the fact table is scanned once), and
    * the 1-row total rejoins as a broadcast cross join.
    */
  def revenueShare(s: SparkSession, d: String): DataFrame = {
    val per = orders(s, d)
      .groupBy("o_orderpriority")
      .agg(sum("o_totalprice").as("rev"))
    val total = per.agg(sum("rev").as("total"))
    per.crossJoin(broadcast(total))
      .select(col("o_orderpriority"),
        round(col("rev"), 2).as("revenue"),
        round(col("rev") / col("total"), 6).as("share"))
      .orderBy("o_orderpriority")
  }

  /** a15 — cumulative distinct users per day (the growth-curve query).
    * The naive form — COUNT(DISTINCT user) OVER (ORDER BY day) — drags
    * every fact row through one unbounded window task. The scalable
    * identity: a user contributes to every day ≥ their FIRST day, so
    * cumulative distinct = running sum of first-appearance counts. One
    * fact-table agg (min day per user), one |days|-row rollup, and the
    * running sum is a window over the |days|-row result — the empty
    * ORDER BY window is fine THERE because the rollup is calendar-sized,
    * never data-sized.
    */
  def cumulativeDistinctUsers(s: SparkSession, d: String): DataFrame = {
    val first = events(s, d)
      .groupBy("user_id")
      .agg(min(date_trunc("day", col("ts"))).as("day"))
    val daily = first.groupBy("day").agg(count(lit(1)).as("new_users"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("cum_users", sum("new_users").over(w))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("new_users"), col("cum_users"))
      .orderBy("day")
  }

  /** f9 — nested build + flatten round-trip: per-order array-of-structs
    * assembly (collect_list of line structs, sort_array'd so the nested
    * order is deterministic) and the inverse explode back to flat rows.
    * This is the document-shaped layout training-data stores use (one
    * row per entity, repeated fields as a nested array); the oracle is
    * the plain flat join the round-trip must reproduce — losing or
    * duplicating a nested element breaks the hash. The assembly groups
    * on the join key, so Catalyst reuses the join's hash partitioning
    * (one logical exchange); the explode is a narrow generator. The
    * per-group array is bounded by lines-per-order (≤7 in TPC-H shape),
    * not by data size, so the collect_list buffer is safe at any SF.
    */
  def nestedRoundtrip(s: SparkSession, d: String): DataFrame = {
    val nested = orders(s, d)
      .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey", "o_orderstatus")
      .agg(sort_array(collect_list(struct(
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))))
        .as("lines"))
    nested
      .select(col("o_orderkey"), col("o_orderstatus"),
        explode(col("lines")).as("ln"))
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("ln.l_linenumber").as("l_linenumber"),
        col("ln.l_quantity").as("l_quantity"),
        col("ln.l_extendedprice").as("l_extendedprice"))
      .orderBy("o_orderkey", "l_linenumber")
  }

  /** Wide→long unpivot (the inverse of a7's pivot): melt numeric order
    * columns into (metric, value) rows, then profile each metric. Uses the
    * native `unpivot` operator — a Generator (one row in, M out) that
    * stays narrow and codegen'd; the only shuffle is the final per-metric
    * aggregate, and unreferenced order columns are pruned at the scan.
    */
  def unpivotProfile(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderkey"),
        col("o_custkey").cast("double").as("o_custkey"),
        col("o_totalprice"))
      .unpivot(Array(col("o_orderkey")), Array(col("o_custkey"), col("o_totalprice")),
        "metric", "value")
      .groupBy("metric")
      .agg(count(lit(1)).as("n"),
        round(avg("value"), 4).as("avg_value"),
        round(sum("value"), 2).as("sum_value"))
      .orderBy("metric")

  /** Gaps-and-islands: per customer, the longest streak of CONSECUTIVE
    * order days. The classic trick — `day − row_number()` is constant
    * exactly within a consecutive run, so runs become group keys — turns
    * an order-dependent sequential scan into two grouped aggregations
    * over one window pass: everything shuffles once on the customer key
    * and composes with partial aggregation. The sequential-looking
    * computation a naive port would write as a per-key loop.
    */
  def longestStreak(s: SparkSession, d: String): DataFrame = {
    val days = orders(s, d)
      .select(col("o_custkey"),
        datediff(col("o_orderdate"), lit("1990-01-01")).as("day"))
      .distinct()
    val w = Window.partitionBy("o_custkey").orderBy("day")
    days.withColumn("grp", col("day") - row_number().over(w))
      .groupBy("o_custkey", "grp").agg(count(lit(1)).as("len"))
      .groupBy("o_custkey")
      .agg(max("len").as("longest_streak"), sum("len").as("n_active_days"))
      .orderBy("o_custkey")
  }

  /** Key-skew diagnostic: the report you run BEFORE choosing a join/agg
    * strategy at scale — per-key row counts for the heaviest keys, each
    * with its share of the table and its multiple of the mean key. One
    * grouped count, one single-row global (broadcast), a bounded top-k.
    * A key at 100× the mean is the signal to salt (u2) or lean on AQE
    * skew-join; this makes that decision data-driven instead of folklore.
    */
  def keySkew(s: SparkSession, d: String, k: Int = 10): DataFrame = {
    val counts = lineitem(s, d).groupBy("l_suppkey").agg(count(lit(1)).as("n"))
    val global = counts.agg(
      sum("n").cast("double").as("total"), avg("n").as("mean_n"))
    counts.crossJoin(broadcast(global))
      .select(col("l_suppkey"), col("n"),
        round(col("n") / col("total"), 6).as("share"),
        round(col("n") / col("mean_n"), 4).as("x_mean"))
      .orderBy(desc("n"), asc("l_suppkey"))
      .limit(k)
  }

  /** a21 — association rules (support / confidence / lift) over order
    * baskets: for every part pair co-occurring in ≥ minPair orders, both
    * directed rules with confidence = P(cons|ante) and
    * lift = P(ante,cons) / (P(ante)·P(cons)) — the market-basket screen
    * behind "frequently bought together". Scale shape: the pair build
    * reuses g2's basket-capped self-join ([[Graph.cappedPairs]] — pair
    * count is quadratic in basket size, so the deterministic per-order
    * cap is what stops one pathological basket emitting 10¹⁰ rows);
    * supports are map-side-combinable counts; the two item-support joins
    * hash on the item key with no forced broadcast (the e12 lesson —
    * item counts scale with |items|, so AQE picks the strategy); the
    * min-support filter runs BEFORE the joins, so rule assembly touches
    * only surviving pairs. Products go through double before dividing —
    * |items|² counts overflow long at the 100 TB design point.
    */
  def assocRules(s: SparkSession, d: String, minPair: Long = 3): DataFrame = {
    val op = lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val nB = op.agg(countDistinct("ok").as("n_baskets"))
    val itemN = op.groupBy("pk").agg(count(lit(1)).as("item_n"))
    val pairN = Graph.cappedPairs(op, Graph.maxBasket)
      .groupBy("u", "v").agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= minPair)
    val both = pairN
      .select(col("u").as("ante"), col("v").as("cons"), col("pair_n"))
      .unionByName(pairN
        .select(col("v").as("ante"), col("u").as("cons"), col("pair_n")))
    both
      .join(itemN.select(col("pk").as("ante"), col("item_n").as("ante_n")), "ante")
      .join(itemN.select(col("pk").as("cons"), col("item_n").as("cons_n")), "cons")
      .crossJoin(broadcast(nB))
      .select(col("ante"), col("cons"), col("pair_n"), col("ante_n"), col("cons_n"),
        round(col("pair_n").cast("double") / col("ante_n"), 6).as("confidence"),
        round(col("pair_n").cast("double") * col("n_baskets") /
          (col("ante_n").cast("double") * col("cons_n")), 6).as("lift"))
      .orderBy("ante", "cons")
  }

  /** a22 — EXACT weighted percentiles of line price weighted by
    * quantity (the "median dollar", not the median line: which price
    * level splits the purchased-units mass in half / at p25/p75/p90 —
    * the inventory/pricing cut `percentile()` cannot answer because it
    * weights every row equally). Built WITHOUT percentile's
    * single-final-task state over the value domain: prices roll up to
    * exact cents, [[Cumulative.runningTotal]] ranks the rollup with the
    * two-pass range-partitioned cumulative weight (every stage
    * partition-parallel — the t21/w2 discipline on a genuinely
    * data-sized ordering), the 1-row total broadcasts back, and each
    * requested percentile is the least value whose cumulative weight
    * crosses it. All comparisons are exact integers (cw·100 ≥ q·W), so
    * the crossing row cannot wobble between engines — fully oracled
    * against DuckDB's window cumsum.
    */
  def weightedPercentiles(s: SparkSession, d: String,
      qpcts: Seq[Int] = Seq(25, 50, 75, 90)): DataFrame = {
    val c = lineitem(s, d).select(
      round(round(col("l_extendedprice"), 2) * 100, 0).cast("long").as("cents"),
      col("l_quantity").cast("long").as("w"))
    val rollup = c.groupBy("cents").agg(sum("w").as("w"))
    val ranked = graft.ops.Cumulative.runningTotal(
      rollup, "w", Seq(col("cents")), "cw")
    val tot = c.agg(sum("w").as("wtot"))
    ranked.crossJoin(broadcast(tot))
      .withColumn("qpct", explode(typedlit(qpcts)))
      .filter(col("cw") * 100 >= col("qpct") * col("wtot"))
      .groupBy("qpct")
      .agg(min("cents").as("value_cents"))
      .orderBy("qpct")
  }

  /** a24 — day-over-day deltas via EXCHANGE REUSE: the daily rollup is
    * self-joined against its previous day, and because both join inputs
    * are the SAME aggregation subplan, Catalyst's ReuseExchange replaces
    * the second with a `ReusedExchange` over the first's shuffle output
    * — events are scanned and aggregated ONCE (spec-pinned: one FileScan,
    * a ReusedExchange node). At 100 TB every compare-to-yesterday
    * dashboard has this shape, and scan-once-join-twice is the
    * difference between one fact pass and two. Exact-cents deltas keep
    * the oracle bit-identical.
    */
  def dayOverDay(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(round(value * 100) as bigint)")).as("cents"))
    daily.as("a").join(daily.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.day") === date_add(col("b.day"), 1))
      .select(col("a.day").as("day"), col("a.event_type").as("event_type"),
        (col("a.n") - col("b.n")).as("delta_n"),
        round((col("a.cents") - col("b.cents")).cast("double") / 100, 2)
          .as("delta_value"))
      .orderBy("day", "event_type")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("a24_day_over_day", (s, d) => dayOverDay(s, d), Some(
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n,
        |    sum(CAST(round(value * 100) AS BIGINT)) AS cents
        |  FROM events GROUP BY 1, 2)
        |SELECT a.day, a.event_type, a.n - b.n AS delta_n,
        |  round(CAST(a.cents - b.cents AS DOUBLE) / 100, 2) AS delta_value
        |FROM daily a JOIN daily b
        |  ON a.event_type = b.event_type AND a.day = b.day + 1
        |ORDER BY 1, 2""".stripMargin)),
    QueryDef("a22_weighted_percentiles", (s, d) => weightedPercentiles(s, d), Some(
      """WITH c AS (
        |  SELECT CAST(round(round(l_extendedprice, 2) * 100, 0) AS BIGINT) AS cents,
        |    CAST(l_quantity AS BIGINT) AS w
        |  FROM lineitem),
        |r AS (SELECT cents, sum(w) AS w FROM c GROUP BY cents),
        |cum AS (SELECT cents, CAST(sum(w) OVER (ORDER BY cents) AS BIGINT) AS cw FROM r),
        |tot AS (SELECT CAST(sum(w) AS BIGINT) AS wtot FROM c),
        |q(qpct) AS (SELECT unnest([25, 50, 75, 90]))
        |SELECT qpct, min(cents) AS value_cents
        |FROM cum, tot, q WHERE cw * 100 >= qpct * wtot
        |GROUP BY qpct ORDER BY qpct""".stripMargin)),
    QueryDef("a21_assoc_rules", (s, d) => assocRules(s, d), Some(
      """WITH op AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |nb AS (SELECT count(DISTINCT ok) AS n_baskets FROM op),
        |item AS (SELECT pk, count(*) AS item_n FROM op GROUP BY 1),
        |pc AS (
        |  SELECT a.pk AS u, b.pk AS v, count(*) AS pair_n
        |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |pairs AS (
        |  SELECT u AS ante, v AS cons, pair_n FROM pc
        |  UNION ALL SELECT v, u, pair_n FROM pc)
        |SELECT ante, cons, pair_n,
        |  ia.item_n AS ante_n, ic.item_n AS cons_n,
        |  round(CAST(pair_n AS DOUBLE) / ia.item_n, 6) AS confidence,
        |  round(CAST(pair_n AS DOUBLE) * n_baskets
        |    / (CAST(ia.item_n AS DOUBLE) * ic.item_n), 6) AS lift
        |FROM pairs JOIN item ia ON pairs.ante = ia.pk
        |JOIN item ic ON pairs.cons = ic.pk
        |CROSS JOIN nb
        |ORDER BY ante, cons""".stripMargin)),
    QueryDef("w6_longest_streak", longestStreak, Some(
      """WITH days AS (
        |  SELECT DISTINCT o_custkey,
        |    date_diff('day', TIMESTAMP '1990-01-01', o_orderdate) AS day
        |  FROM orders),
        |seq AS (
        |  SELECT o_custkey, day,
        |    day - row_number() OVER (PARTITION BY o_custkey ORDER BY day) AS grp
        |  FROM days),
        |runs AS (SELECT o_custkey, grp, count(*) AS len FROM seq GROUP BY 1, 2)
        |SELECT o_custkey, CAST(max(len) AS BIGINT) AS longest_streak,
        |  CAST(sum(len) AS BIGINT) AS n_active_days
        |FROM runs GROUP BY 1 ORDER BY 1""".stripMargin)),
    QueryDef("prof2_key_skew", (s, d) => keySkew(s, d), Some(
      """WITH c AS (SELECT l_suppkey, count(*) AS n FROM lineitem GROUP BY 1),
        |g AS (SELECT CAST(sum(n) AS DOUBLE) AS total, avg(n) AS mean_n FROM c)
        |SELECT l_suppkey, n, round(n / total, 6) AS share,
        |  round(n / mean_n, 4) AS x_mean
        |FROM c, g ORDER BY n DESC, l_suppkey LIMIT 10""".stripMargin)),
    QueryDef("a10_unpivot", unpivotProfile, Some(
      """WITH long AS (
        |  SELECT o_orderkey, 'o_custkey' AS metric, CAST(o_custkey AS DOUBLE) AS value FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 'o_totalprice', o_totalprice FROM orders)
        |SELECT metric, count(*) AS n,
        |  round(avg(value), 4) AS avg_value,
        |  round(sum(value), 2) AS sum_value
        |FROM long GROUP BY 1 ORDER BY 1""".stripMargin)),
    QueryDef("a11_grouping_sets", groupingSetsFlags, Some(
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 4) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),
    QueryDef("a5_cube", cubeFlags, Some(
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),
    QueryDef("a6_percentiles", percentilesByPriority, Some(
      """SELECT o_orderpriority, count(*) AS n,
        |  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  round(quantile_cont(o_totalprice, 0.75), 4) AS p75
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),
    QueryDef("a7_pivot", pivotSegments, Some(
      """SELECT n_name,
        |  count(*) FILTER (c_mktsegment = 'AUTOMOBILE') AS "AUTOMOBILE",
        |  count(*) FILTER (c_mktsegment = 'BUILDING') AS "BUILDING",
        |  count(*) FILTER (c_mktsegment = 'FURNITURE') AS "FURNITURE",
        |  count(*) FILTER (c_mktsegment = 'HOUSEHOLD') AS "HOUSEHOLD",
        |  count(*) FILTER (c_mktsegment = 'MACHINERY') AS "MACHINERY"
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)),
    QueryDef("j6_asof", asofLastOrder, Some(asofOracle)),
    // j6's oracle VERBATIM: the custom physical operator, the window
    // composition, and SQL ASOF JOIN must all hash-agree
    QueryDef("j12_asof_native", asofNativeLastOrder, Some(asofOracle)),
    QueryDef("j7_band_join", bandJoinPriceTiers, Some(
      """SELECT tier, count(*) AS n, round(sum(o_totalprice), 2) AS revenue
        |FROM orders
        |JOIN (VALUES ('t1_budget', 0, 50000), ('t2_low', 50000, 150000),
        |             ('t3_mid', 150000, 300000), ('t4_high', 300000, 450000),
        |             ('t5_top', 450000, 1e18)) t(tier, lo, hi)
        |  ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY 1 ORDER BY 1""".stripMargin)),
    QueryDef("q2_lateral_topk", lateralTopPerNation, Some(
      """SELECT n_name, c_custkey, bal
        |FROM nation,
        |LATERAL (SELECT c_custkey, round(c_acctbal, 2) AS bal
        |         FROM customer WHERE c_nationkey = n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 3)
        |ORDER BY n_name, bal DESC, c_custkey""".stripMargin)),
    QueryDef("q5_recursive_hierarchy", recursiveHierarchy, Some(
      """WITH RECURSIVE walk(part, node, depth) AS (
        |  SELECT p_partkey, p_partkey, 0 FROM part
        |  UNION ALL
        |  SELECT part, node // 2, depth + 1 FROM walk WHERE node > 1)
        |SELECT w.part AS p_partkey, max(w.depth) AS depth,
        |  count(*) AS n_ancestors,
        |  CAST(sum(CAST(round(round(p.p_retailprice, 2) * 100, 0) AS BIGINT)) AS BIGINT) AS path_cost_cents
        |FROM walk w JOIN part p ON w.node = p.p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)),
    QueryDef("q1_correlated_subquery", aboveNationAvg, Some(
      """SELECT c_custkey, round(c_acctbal, 2) AS bal
        |FROM customer o
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer i
        |                   WHERE i.c_nationkey = o.c_nationkey)
        |ORDER BY c_custkey""".stripMargin)),
    QueryDef("f6_array_funcs", arrayFuncs, Some(
      """SELECT p_partkey,
        |  len(string_split(p_name, ' ')) AS n_tokens,
        |  len(list_distinct(string_split(p_name, ' '))) AS n_distinct,
        |  array_to_string(list_sort(string_split(p_name, ' ')), ',') AS sorted_toks,
        |  array_to_string(string_split(p_name, ' ')[1:2], ',') AS first2,
        |  array_to_string(list_reverse(string_split(p_name, ' ')), ',') AS reversed,
        |  string_split(p_name, ' ')[-1] AS last_tok
        |FROM part ORDER BY p_partkey""".stripMargin)),
    QueryDef("u1_vector_sum_agg", vectorSumAgg, Some(
      """SELECT l_suppkey AS user_id, count(DISTINCT l_partkey) AS n_items,
        |  round(sum(l_quantity), 4) AS vec_sum
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),
    QueryDef("f7_json_parse", jsonParse, Some(
      """SELECT event_type, count(*) AS n,
        |  min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
        |  round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 6) AS avg_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),
    // rows-only: estimates have no DuckDB twin; merge-identity and error
    // bounds pinned in AnalyticsSpec
    QueryDef("a17_hll_rollup", hllRollup, Some(
      // the EXACT re-aggregation half oracled (r17 #7); the in-band
      // boolean is the estimate's judgment — TRUE in the oracle, so an
      // out-of-band sketch estimate breaks the hash
      """SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
        |  count(DISTINCT user_id) AS exact_users, TRUE AS est_in_band
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),
    QueryDef("a20_bitmap_distinct", bitmapDistinctRollup, Some(
      """SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),
    QueryDef("a18_quantile_sketch", quantileSketchRollup, Some(
      """WITH ev AS (
        |  SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
        |    CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events),
        |b AS (
        |  SELECT week, c, length(bin(c)) - 1 AS e FROM ev WHERE c > 0),
        |b2 AS (
        |  SELECT week,
        |    e * 16 + ((c - (CAST(1 AS BIGINT) << e)) * 16)
        |      // (CAST(1 AS BIGINT) << e) AS bin_id
        |  FROM b),
        |bins AS (
        |  SELECT week, bin_id, count(*) AS cnt FROM b2 GROUP BY 1, 2),
        |w AS (
        |  SELECT week, bin_id, cnt,
        |    ((CAST(1 AS BIGINT) << (bin_id // 16))
        |      + (bin_id % 16 + 1) * (CAST(1 AS BIGINT) << (bin_id // 16))
        |        / 16.0) / 100.0 AS est,
        |    sum(cnt) OVER (PARTITION BY week ORDER BY bin_id) AS cum,
        |    sum(cnt) OVER (PARTITION BY week) AS total
        |  FROM bins)
        |SELECT week, CAST(max(total) AS BIGINT) AS n,
        |  round(min(CASE WHEN cum >= ceil(0.5 * total) THEN est END), 6) AS p50_est,
        |  round(min(CASE WHEN cum >= ceil(0.95 * total) THEN est END), 6) AS p95_est,
        |  round(min(CASE WHEN cum >= ceil(0.99 * total) THEN est END), 6) AS p99_est
        |FROM w GROUP BY week ORDER BY week""".stripMargin)),
    QueryDef("f10_map_roundtrip", mapRoundtrip, Some(
      """SELECT o_custkey, o_orderpriority, count(*) AS n
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    QueryDef("a19_topk_with_ties", topkWithTies, Some(
      """WITH r AS (
        |  SELECT l_returnflag, l_quantity,
        |    rank() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_quantity DESC) AS rk
        |  FROM lineitem)
        |SELECT l_returnflag, round(max(l_quantity), 4) AS top_qty,
        |  count(*) AS n_tied
        |FROM r WHERE rk = 1 GROUP BY 1 ORDER BY 1""".stripMargin)),
    QueryDef("q4_exists_split", existsSplit, Some(
      """SELECT s_nationkey,
        |  count(*) AS n_suppliers,
        |  CAST(sum(CASE WHEN EXISTS (
        |    SELECT 1 FROM lineitem l
        |    WHERE l.l_suppkey = s.s_suppkey AND l.l_returnflag = 'R')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_with_returns,
        |  CAST(sum(CASE WHEN NOT EXISTS (
        |    SELECT 1 FROM lineitem l
        |    WHERE l.l_suppkey = s.s_suppkey AND l.l_returnflag = 'R')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
        |FROM supplier s
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)),
    QueryDef("q3_scalar_subqueries", scalarSubqueries, Some(
      """SELECT c_custkey,
        |  (SELECT count(*) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS n_orders,
        |  (SELECT round(max(o_totalprice), 2) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS max_price
        |FROM customer c
        |ORDER BY c_custkey""".stripMargin)),
    QueryDef("f11_bitwise_aggs", bitwiseAggs, Some(
      """SELECT o_orderpriority,
        |  bit_and(o_orderkey % 256) AS mask_and,
        |  bit_or(o_orderkey % 256) AS mask_or,
        |  bit_xor(o_orderkey % 256) AS mask_xor
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),
    QueryDef("a16_revenue_share", revenueShare, Some(
      """WITH per AS (
        |  SELECT o_orderpriority, sum(o_totalprice) AS rev
        |  FROM orders GROUP BY 1),
        |t AS (SELECT sum(rev) AS total FROM per)
        |SELECT o_orderpriority, round(rev, 2) AS revenue,
        |  round(rev / total, 6) AS share
        |FROM per CROSS JOIN t ORDER BY o_orderpriority""".stripMargin)),
    QueryDef("a15_cumulative_distinct", cumulativeDistinctUsers, Some(
      """WITH f AS (
        |  SELECT user_id, min(date_trunc('day', ts)) AS day
        |  FROM events GROUP BY 1),
        |daily AS (SELECT day, count(*) AS new_users FROM f GROUP BY 1)
        |SELECT strftime(day, '%Y-%m-%d') AS day, new_users,
        |  CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
        |FROM daily ORDER BY day""".stripMargin)),
    // oracle is the PLAIN flat join: the nested assembly + explode must
    // reproduce it row-for-row or the hash breaks
    QueryDef("f9_nested_roundtrip", nestedRoundtrip, Some(
      """SELECT o_orderkey, o_orderstatus, l_linenumber, l_quantity,
        |  l_extendedprice
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |ORDER BY o_orderkey, l_linenumber""".stripMargin)),
    QueryDef("u2_salted_agg", saltedAgg, Some(
      """SELECT l_suppkey, round(sum(l_quantity), 4) AS total_qty,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),
    // oracle is the PLAIN (unsalted) join: hash-match proves the salted
    // plan is a pure shuffle-shape change
    QueryDef("j8_salted_join", (s, d) => saltedSkewJoin(s, d), Some(
      """SELECT s_nationkey, count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem JOIN supplier
        |  ON (CASE WHEN l_orderkey % 3 = 0 THEN 1 ELSE l_suppkey END) = s_suppkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)),
    // oracle is the PLAIN join: hash-match proves the bloom prefilter is
    // a pure data-reduction, never a semantics change
    QueryDef("j9_bloom_join", (s, d) => bloomPrefilterJoin(s, d), Some(
      """SELECT o_orderpriority, count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 480000
        |GROUP BY 1 ORDER BY 1""".stripMargin)),
    QueryDef("w4_window_zoo", windowZoo, Some(
      """SELECT o_orderpriority, o_orderkey,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume,
        |  first_value(o_orderkey) OVER w AS first_key,
        |  lag(o_orderkey, 2) OVER w AS lag2,
        |  lead(o_orderkey, 2) OVER w AS lead2
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin)),
    QueryDef("w5_sliding_revenue", (s, d) => slidingRevenue(s, d), Some(
      """SELECT o_custkey, o_orderkey,
        |  CAST(date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
        |  round(sum(o_totalprice) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS rev30
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)),
    QueryDef("u3_topk_agg", (s, d) => topKAgg(s, d), Some(
      // identical semantics to w1's window top-3 — intentionally the same
      // oracle: the aggregator must reproduce the window form exactly
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)),
    QueryDef("a8_histogram", (s, d) => histogram(s, d), Some(
      """SELECT CAST(floor(o_totalprice / 25000.0::DOUBLE) AS INT) AS bucket,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),
    QueryDef("a13_multi_distinct", multiDistinct, Some(
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(DISTINCT l_orderkey) AS n_orders,
        |  count(*) AS n_rows,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),
    QueryDef("a14_regr_by_segment", regrBySegment, Some(
      """SELECT c_mktsegment, count(*) AS n,
        |  round(regr_slope(o_totalprice, o_orderdate::DATE - DATE '1995-01-01'), 6)
        |    AS slope_per_day,
        |  round(regr_intercept(o_totalprice, o_orderdate::DATE - DATE '1995-01-01'), 2)
        |    AS intercept,
        |  round(regr_r2(o_totalprice, o_orderdate::DATE - DATE '1995-01-01'), 6)
        |    AS r2
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),
    QueryDef("a9_bivariate_stats", bivariateStats, Some(
      """SELECT count(*) AS n,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_samp_qp,
        |  round(covar_pop(l_quantity, l_extendedprice), 2) AS covar_pop_qp
        |FROM lineitem""".stripMargin)),
    QueryDef("prof1_column_stats", columnStats, Some(
      """SELECT 'o_orderkey' AS "column", count(*) AS n,
        |  count(*) - count(o_orderkey) AS n_null,
        |  count(DISTINCT o_orderkey) AS n_distinct,
        |  round(CAST(min(o_orderkey) AS DOUBLE), 4) AS min_val,
        |  round(CAST(max(o_orderkey) AS DOUBLE), 4) AS max_val
        |FROM orders
        |UNION ALL
        |SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
        |  count(DISTINCT o_custkey),
        |  round(CAST(min(o_custkey) AS DOUBLE), 4),
        |  round(CAST(max(o_custkey) AS DOUBLE), 4)
        |FROM orders
        |UNION ALL
        |SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
        |  count(DISTINCT o_totalprice),
        |  round(CAST(min(o_totalprice) AS DOUBLE), 4),
        |  round(CAST(max(o_totalprice) AS DOUBLE), 4)
        |FROM orders
        |ORDER BY 1""".stripMargin))
  )
}
