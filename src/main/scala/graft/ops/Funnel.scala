package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** MATCH_RECOGNIZE-shaped k-step funnel: from a set of anchor events,
  * walk BACKWARD through an arbitrary list of (event type, max gap)
  * steps — each step must find the latest same-user event of its type
  * at-or-before the previous step's time, within the step's gap — and
  * report how many anchors survive each prefix of the chain.
  *
  * This generalizes e9's hard-coded two hops into a fold over step
  * specs: every step is ONE [[graft.plans.AsOf]] join (the custom
  * merge-pass operator — O(|L|+|R|) per co-partition, hash exchanges
  * provided by EnsureRequirements), so a k-step funnel is k as-of joins
  * over a monotonically SHRINKING frontier — never a window over the
  * whole event stream, never a per-user collect. The reference has
  * nothing like it (SURVEY §2: batch-only MR pipeline); extension
  * surface.
  */
object Funnel {
  import Tables._

  /** anchors must expose (anchor_id, user_id, ts). Output is one row:
    * step_0 = |anchors|, step_i = anchors whose first i steps all
    * matched within their gaps. `steps` is (event_type, SQL interval
    * string), applied in order, each anchored at the PREVIOUS step's
    * matched time — e9's click-then-view chain is exactly
    * Seq(("click", "24 HOURS"), ("view", "1 HOUR")).
    */
  def boundedSequence(events: DataFrame, anchors: DataFrame,
      steps: Seq[(String, String)]): DataFrame = {
    var frontier = anchors.select(col("anchor_id"), col("user_id"),
      col("ts").as("t"))
    var out = anchors.agg(count(lit(1)).as("step_0"))
    steps.zipWithIndex.foreach { case ((etype, gap), i) =>
      val stream = events.filter(col("event_type") === etype)
        .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
      val joined = graft.plans.AsOf
        .join(frontier, stream, "user_id", "s_user", "t", "s_ts")
        .withColumn("ok",
          col("s_ts").isNotNull &&
            col("s_ts") >= col("t") - expr(s"INTERVAL $gap"))
      out = out.crossJoin(joined.agg(
        coalesce(sum(when(col("ok"), 1L).otherwise(0L)), lit(0L))
          .as(s"step_${i + 1}")))
      frontier = joined.filter(col("ok"))
        .select(col("anchor_id"), col("user_id"), col("s_ts").as("t"))
    }
    out
  }

  /** e14 — three-hop funnel: purchase ← click (≤24h) ← view (≤1h
    * before the click) ← click (≤6h before the view). Oracled against
    * three chained DuckDB ASOF joins; e9 is re-expressed through the
    * same fold (two hops) with an identical result hash.
    */
  def threeHopFunnel(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("anchor_id"), col("user_id"), col("ts"))
    boundedSequence(ev, purchases,
      Seq(("click", "24 HOURS"), ("view", "1 HOUR"), ("click", "6 HOURS")))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("e14_funnel_steps", (s, d) => threeHopFunnel(s, d), Some(
      // e9's oracle pattern: one inequality per ASOF ON clause, gap
      // predicates in separate MATERIALIZED layers so the optimizer
      // cannot push them into the ASOF binder
      """WITH p AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id AS cu, ts AS cts FROM events WHERE event_type = 'click'),
        |v AS (SELECT user_id AS vu, ts AS vts FROM events WHERE event_type = 'view'),
        |s1 AS MATERIALIZED (
        |  SELECT p.event_id, p.user_id, p.ts, c.cts
        |  FROM p ASOF LEFT JOIN c ON p.user_id = c.cu AND p.ts >= c.cts),
        |s1ok AS MATERIALIZED (
        |  SELECT *, cts IS NOT NULL AND cts >= ts - INTERVAL 24 HOUR AS ok1 FROM s1),
        |s2 AS MATERIALIZED (
        |  SELECT x.event_id, x.user_id, x.cts, v.vts
        |  FROM (SELECT * FROM s1ok WHERE ok1) x
        |  ASOF LEFT JOIN v ON x.user_id = v.vu AND x.cts >= v.vts),
        |s2ok AS MATERIALIZED (
        |  SELECT *, vts IS NOT NULL AND vts >= cts - INTERVAL 1 HOUR AS ok2 FROM s2),
        |s3 AS MATERIALIZED (
        |  SELECT y.event_id, y.user_id, y.vts, c2.cts AS c2ts
        |  FROM (SELECT * FROM s2ok WHERE ok2) y
        |  ASOF LEFT JOIN c c2 ON y.user_id = c2.cu AND y.vts >= c2.cts),
        |s3ok AS MATERIALIZED (
        |  SELECT *, c2ts IS NOT NULL AND c2ts >= vts - INTERVAL 6 HOUR AS ok3 FROM s3)
        |SELECT
        |  (SELECT count(*) FROM p) AS step_0,
        |  (SELECT CAST(sum(CASE WHEN ok1 THEN 1 ELSE 0 END) AS BIGINT) FROM s1ok) AS step_1,
        |  (SELECT CAST(sum(CASE WHEN ok2 THEN 1 ELSE 0 END) AS BIGINT) FROM s2ok) AS step_2,
        |  (SELECT CAST(sum(CASE WHEN ok3 THEN 1 ELSE 0 END) AS BIGINT) FROM s3ok) AS step_3""".stripMargin))
  )
}
