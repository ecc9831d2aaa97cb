package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** src28/src29 — the SQL front door must be indistinguishable from the
  * DataFrame verbs, and must die loudly outside its declared shape.
  */
class TtCatalogSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq

  test("SQL VERSION AS OF ≡ DataFrame ttAsOf, row for row") {
    val sql = Sources.sqlTimeTravel(spark, sf0001)
    val viaDf = graft.ops.Mutations.timeTravelRollup(spark, sf0001)
    assert(rows(sql) == rows(viaDf),
      "SQL time travel diverges from the DataFrame form")
  }

  test("SQL MERGE INTO ≡ DataFrame ttMergeInto, row for row; bad shapes die loudly") {
    val sql = Sources.sqlMergeInto(spark, sf0001)
    val viaDf = graft.ops.Mutations.mergeIntoRollup(spark, sf0001)
    assert(rows(sql) == rows(viaDf),
      "SQL MERGE diverges from the DataFrame form")
    // an unsupported shape over a tt target must fail at ANALYSIS with
    // the rule's own message — never a silent partial merge and never
    // Spark's generic unsupported-table error
    val dir = graft.ops.Mutations.ttStore(spark, sf0001)
    TtCatalog.install(spark)
    TtCatalog.register("up18_spec_store", dir)
    graft.ops.Mutations.ttMergeSource(spark, sf0001)
      .createOrReplaceTempView("graft_tt_merge_src_spec")
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("""MERGE INTO tt.up18_spec_store t
        USING graft_tt_merge_src_spec s
        ON t.event_id = s.event_id
        WHEN MATCHED THEN DELETE""")
    }
    assert(err.getMessage.contains("tt MERGE supports exactly"),
      s"wrong failure for unsupported merge shape: ${err.getMessage}")
    // a versioned read of an unregistered table dies with NoSuchTable
    val missing = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM tt.nope VERSION AS OF 1").collect()
    }
    assert(missing.getMessage.toLowerCase.contains("table"),
      s"unexpected unregistered-table failure: ${missing.getMessage}")
  }
}
