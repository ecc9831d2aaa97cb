package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Scale-gated global quantile cuts — the shared primitive behind every
  * "compute a handful of percentile boundaries, broadcast them back"
  * pattern (t20's perplexity tiers, e8's RFM quartiles).
  *
  * Why a gate: Spark's exact `percentile` buffers one counter PER DISTINCT
  * VALUE of the aggregated column in the FINAL aggregation task. Where the
  * domain is bounded (integer day latencies, cents on a calendar-sized
  * rollup) that state is small and exactness is free — but over a column
  * like t20's `avg_logprob` (~one distinct double per document) the final
  * task's state is corpus-sized at 100 TB: the one shape that cannot ship.
  * Above the gate we switch to `percentile_approx` — Spark's
  * Greenwald–Khanna sketch, whose state is bounded by the accuracy
  * parameter and which merges map-side like any algebraic agg.
  *
  * The gate itself is t12's discipline (`pigeonholeBarBites`): a cheap,
  * deterministic decision measured on the data, taken BEFORE the
  * dangerous shape runs. Here the measurement is one
  * `approx_count_distinct` pass over the (already rolled-up) input —
  * HLL++ state, fixed hash, deterministic for a given dataset — so the
  * decision is rerun-stable and costs one bounded-output agg.
  *
  * At sf0.01 every current caller stays far below the default cap, so the
  * exact path runs and the DuckDB `quantile_cont` oracles keep matching
  * bit-for-bit; the sketch path exists for the regime where no exact
  * oracle could run anyway.
  */
object Stats {

  /** One named family of cuts: output column `name` holds array(qs) of
    * boundary values for `col`. */
  final case class CutSpec(name: String, col: String, qs: Seq[Double])

  /** Distinct-value ceiling for the exact path: ~2M counters is a few
    * hundred MB of final-task agg state — comfortably inside one
    * executor, far past every bounded-domain caller. */
  val DefaultExactDomainCap: Long = 1L << 21

  /** `percentile_approx` accuracy above the cap: error ≤ 1/10000 of the
    * rank, state O(accuracy · log n) — independent of the domain size. */
  val SketchAccuracy: Int = 10000

  /** The path decision, exposed pure so the spec can pin both regimes
    * without driving a 2M-distinct-value job (t12's
    * `pigeonholeBarBites` precedent). */
  def exactCutsFit(distinctEstimate: Long, cap: Long): Boolean =
    distinctEstimate <= cap

  /** Quantile boundaries for each spec in ONE aggregation over `df`,
    * each column independently gated exact-vs-sketch on its estimated
    * domain. Returns the 1-row cuts frame (one array column per spec)
    * plus the per-spec exact? decisions for callers/specs that pin the
    * plan shape.
    */
  def quantileCuts(df: DataFrame, specs: Seq[CutSpec],
      exactDomainCap: Long = DefaultExactDomainCap,
      accuracy: Int = SketchAccuracy): (DataFrame, Seq[Boolean]) = {
    require(specs.nonEmpty, "quantileCuts needs at least one CutSpec")
    // the gate measurement: one pass, |specs|-column 1-row output
    val est: Row = df.agg(
      approx_count_distinct(specs.head.col),
      specs.tail.map(sp => approx_count_distinct(sp.col)): _*).head()
    val exact = specs.indices
      .map(i => exactCutsFit(est.getLong(i), exactDomainCap))
    val aggs = specs.zip(exact).map { case (sp, ex) =>
      val arr = sp.qs.mkString("array(", ", ", ")")
      val call =
        if (ex) s"percentile(${sp.col}, $arr)"
        else s"percentile_approx(${sp.col}, $arr, $accuracy)"
      expr(call).as(sp.name)
    }
    (df.agg(aggs.head, aggs.tail: _*), exact)
  }
}
