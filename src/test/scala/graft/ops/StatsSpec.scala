package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the scale gate on [[Stats.quantileCuts]]: exact below the domain
  * cap (bit-identical to plain `percentile`, so the DuckDB
  * `quantile_cont` oracles keep matching), Greenwald–Khanna sketch above
  * it (no per-distinct-value final-task state), decided per column.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  private def planted(n: Int) =
    (1 to n).map(i => (i.toDouble, (i % 7).toDouble)).toDF("wide", "narrow")

  test("exact path below the cap is bit-identical to plain percentile") {
    val df = planted(500)
    val (cuts, exact) = Stats.quantileCuts(df,
      Seq(Stats.CutSpec("c", "wide", Seq(0.25, 0.5, 0.75))))
    assert(exact === Seq(true))
    val got = cuts.head().getSeq[Double](0)
    val want = df.agg(expr("percentile(wide, array(0.25, 0.5, 0.75))"))
      .head().getSeq[Double](0)
    assert(got === want)
  }

  test("gate flips to the sketch on a planted large domain, per column") {
    val df = planted(1000)
    val (cuts, exact) = Stats.quantileCuts(df,
      Seq(Stats.CutSpec("w", "wide", Seq(0.5)),
        Stats.CutSpec("n", "narrow", Seq(0.5))),
      exactDomainCap = 100)
    // wide has 1000 distinct values -> sketch; narrow has 7 -> exact
    assert(exact === Seq(false, true))
    // the sketch path must plan ApproximatePercentile, and the only
    // exact Percentile left must be the bounded narrow column's — i.e.
    // no data-sized aggregation state anywhere in the plan
    val agg = cuts.queryExecution.optimizedPlan.toString
    assert(agg.contains("percentile_approx(wide"))
    assert(!agg.contains("percentile(wide"))
    assert(agg.contains("percentile(narrow"))
    // at accuracy 10000 >> n the sketch is rank-exact: the median of
    // 1..1000 must land on an actual value adjacent to the true rank
    val w = cuts.head().getSeq[Double](0).head
    assert(math.abs(w - 500.0) <= 1.0, s"sketch median drifted: $w")
  }

  test("gate decision is pure and spec-drivable without a 2M-value job") {
    assert(Stats.exactCutsFit(1000, Stats.DefaultExactDomainCap))
    assert(Stats.exactCutsFit(Stats.DefaultExactDomainCap,
      Stats.DefaultExactDomainCap))
    assert(!Stats.exactCutsFit(Stats.DefaultExactDomainCap + 1,
      Stats.DefaultExactDomainCap))
  }

  test("t20/e8 callers stay on the exact path at test scale") {
    val scored = graft.ops.TextAnalysis.bigramScore(spark, sf0001)
      .select(col("avg_logprob"))
    val (_, exact) = Stats.quantileCuts(scored,
      Seq(Stats.CutSpec("c", "avg_logprob",
        Seq(0.3333333333333333, 0.6666666666666666))))
    assert(exact === Seq(true))
  }
}
