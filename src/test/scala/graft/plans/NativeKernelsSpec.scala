package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Pins for the NativeKernelRule optimizer rewrite: it fires exactly on
  * the shapes it claims (double-cast multiply, literal 0.0 zero, identity
  * finish, provably null-free ARRAY<FLOAT>), produces bit-identical
  * numerics, and leaves every near-miss shape alone.
  */
class NativeKernelsSpec extends SparkSpec {

  private val pairs = Seq(
    (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (Array(0.5f, -1.5f, 2.25f), Array(-0.25f, 3.5f, 1.125f)),
    (Array(1e-4f, 2e4f, -3.75f), Array(7.5f, -2e-3f, 0.0f)))

  // Array[Float] encoder ⇒ ArrayType(FloatType, containsNull = false).
  // repartition(1) keeps ConvertToLocalRelation from constant-evaluating
  // the whole projection at optimization time (the plan would collapse to
  // a LocalRelation and hide whether the rewrite fired).
  private def df: DataFrame =
    { import spark.implicits._; pairs.toDF("a", "b").repartition(1) }

  private def dotSql(l: String, r: String): String =
    s"aggregate(zip_with($l, $r, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "0.0D, (acc, e) -> acc + e)"

  private def refDot(a: Array[Float], b: Array[Float]): Double =
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }

  private def optimized(q: DataFrame): String = q.queryExecution.optimizedPlan.toString

  test("dot shape fuses to graft_dot, bit-identical to the builtin fold") {
    val q = df.selectExpr("a", "b", s"${dotSql("a", "b")} AS dot")
    val plan = optimized(q)
    assert(plan.contains("graft_dot"), s"dot shape not fused:\n$plan")
    assert(!plan.contains("zip_with") && !plan.contains("aggregate("),
      s"builtin residue left after fusion:\n$plan")
    val got = q.collect().map(_.getDouble(2))
    val want = pairs.map { case (a, b) => refDot(a, b) }
    assert(got.toSeq == want, s"fused dot diverged: $got vs $want")
  }

  test("cosine shape fuses all three dots into one graft_cosine") {
    val cosSql = s"${dotSql("a", "b")} / " +
      s"(sqrt(${dotSql("a", "a")}) * sqrt(${dotSql("b", "b")})) AS cos"
    val q = df.selectExpr("a", "b", cosSql)
    val plan = optimized(q)
    assert(plan.contains("graft_cosine"), s"cosine shape not fused:\n$plan")
    assert(!plan.contains("graft_dot"),
      s"partial fusion — free dots left behind:\n$plan")
    val got = q.collect().map(_.getDouble(2))
    val want = pairs.map { case (a, b) =>
      refDot(a, b) / (math.sqrt(refDot(a, a)) * math.sqrt(refDot(b, b)))
    }
    assert(got.toSeq == want, s"fused cosine diverged: $got vs $want")
  }

  test("float-multiply variant is left alone (its numerics differ)") {
    // x * y on FLOAT rounds each product to float32 before the double
    // fold — rewriting it would CHANGE results, so the rule must not.
    val q = df.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, e) -> acc + e) AS dot")
    assert(!optimized(q).contains("graft_dot"))
  }

  test("nullable-element arrays fuse too, with the builtin's null semantics") {
    import spark.implicits._
    // Seq[Option[Float]] encoder ⇒ containsNull = true (like parquet reads)
    val nullable = Seq(
      (Seq(Option(1.0f), Option(2.0f)), Seq(Option(3.0f), Option(4.0f))), // clean
      (Seq(Option(1.0f), None), Seq(Option(3.0f), Option(4.0f))),         // null element
      (Seq(Option(1.0f)), Seq(Option(3.0f), Option(4.0f))))               // length mismatch
      .toDF("a", "b").repartition(1)
    val q = nullable.selectExpr(s"${dotSql("a", "b")} AS dot")
    assert(optimized(q).contains("graft_dot"),
      s"rule did not fire on nullable elements:\n${optimized(q)}")
    val rows = q.collect()
    assert(rows(0).getDouble(0) == (3.0 + 8.0))
    assert(rows(1).isNullAt(0), "null element must yield NULL like the builtin")
    assert(rows(2).isNullAt(0), "length mismatch must yield NULL like the builtin")
  }

  test("declared v5 runs the fused kernel in its physical plan") {
    val q = graft.SparkEntry.queries("v5_fused_naive_cosine")(spark, sf0001)
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("graft_cosine"), s"v5 not fused:\n$p")
    assert(!p.contains("zip_with"), s"builtin residue in v5:\n$p")
    // and it agrees with the native-kernel v1 path on the overlap
    val v5 = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val v1 = graft.SparkEntry.queries("v1_cosine_threshold")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(v1.subsetOf(v5), "v5 (8 queries) must contain v1's pairs (5 queries)")
  }

  test("SQL surface: graft_dot / graft_cosine callable from spark.sql") {
    df.createOrReplaceTempView("nk_pairs")
    val got = spark.sql(
      "SELECT graft_dot(a, b) AS d, graft_cosine(a, b) AS c FROM nk_pairs")
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val want = pairs.map { case (a, b) =>
      (refDot(a, b),
        refDot(a, b) / (math.sqrt(refDot(a, a)) * math.sqrt(refDot(b, b))))
    }
    assert(got.toSeq == want)
  }
}
