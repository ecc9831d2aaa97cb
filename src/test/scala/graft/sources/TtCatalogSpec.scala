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

  test("SQL DELETE routes to a deletion-vector commit: no data file touched, result ≡ DataFrame DV delete") {
    // snapshot the store's data files BEFORE the SQL delete runs
    val probeDir = graft.ops.Mutations.ttStore(spark, sf0001)
    val fs = new org.apache.hadoop.fs.Path(probeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def fileIds(dir: String): Map[String, (Long, Long)] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
      val out = scala.collection.mutable.Map.empty[String, (Long, Long)]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet"))
          out(f.getPath.toUri.getPath) = (f.getLen, f.getModificationTime)
      }
      out.toMap
    }
    TtCatalog.install(spark)
    TtCatalog.register("up20_spec_store", probeDir)
    val pre = fileIds(probeDir)
    spark.sql("DELETE FROM tt.up20_spec_store WHERE event_id % 23 = 0")
    val post = fileIds(probeDir)
    pre.foreach { case (p, id) =>
      assert(post.get(p).contains(id), s"SQL DELETE rewrote data file $p")
    }
    assert((post.keySet -- pre.keySet).forall(_.contains("/_dv/")),
      "SQL DELETE added a non-sidecar file")
    // the SQL head read applies the vectors and equals the DataFrame form
    val viaSql = rows(spark.sql(
      """SELECT event_type, count(*) AS n, sum(cents) AS sum_cents
        FROM tt.up20_spec_store GROUP BY event_type ORDER BY event_type"""))
    val dfDir = graft.ops.Mutations.ttStore(spark, sf0001)
    graft.ops.Mutations.ttDvDelete(spark, dfDir, 4, "dv4",
      pmod(col("event_id"), lit(23)) === 0)
    val viaDf = rows(graft.ops.Mutations.ttAsOf(spark, dfDir, 4)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
      .orderBy("event_type"))
    assert(viaSql == viaDf, "SQL DELETE diverges from the DataFrame DV delete")
  }

  test("SQL UPDATE routes to a merge-on-read update commit ≡ DataFrame ttDvUpdate") {
    val viaSql = rows(Sources.sqlUpdate(spark, sf0001))
    val dfDir = graft.ops.Mutations.ttStore(spark, sf0001)
    graft.ops.Mutations.ttDvUpdate(spark, dfDir, 4, "u4",
      col("event_type") === "purchase",
      Seq("cents" -> (col("cents") + lit(77L))))
    val viaDf = rows(graft.ops.Mutations.ttAsOf(spark, dfDir, 4)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
      .orderBy("event_type"))
    assert(viaSql == viaDf, "SQL UPDATE diverges from the DataFrame form")
  }
}
