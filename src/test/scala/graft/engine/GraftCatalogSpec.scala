package graft.engine

import graft.SparkSpec

/** The SQL front-end must answer the engine's own declared queries: for
  * dialect-shared oracle SQL, `spark.sql(<oracle verbatim>)` over the
  * registered views must return exactly what the DataFrame form returns
  * (which the driver separately hash-checks against DuckDB — so SQL
  * surface ≡ DataFrame surface ≡ oracle).
  */
class GraftCatalogSpec extends SparkSpec {

  // ANSI-portable oracle strings (no ::casts, no DuckDB list functions)
  private val shared = Seq(
    "a1_tpch_q1", "j2_star_revenue", "j4_anti_not_exists", "set1_ops")

  test("spark.sql over registered views matches the DataFrame form verbatim") {
    GraftCatalog.register(spark, sf0001)
    for (name <- shared) {
      val sql = graft.SparkEntry.oracleSql(name)
      val viaSql = spark.sql(sql).collect().map(_.toSeq).toSeq
      val viaDf = graft.SparkEntry.queries(name)(spark, sf0001)
        .collect().map(_.toSeq).toSeq
      assert(viaSql == viaDf, s"$name: SQL result diverges from DataFrame result")
    }
  }

  test("every test table is queryable by name after register") {
    GraftCatalog.register(spark, sf0001)
    for (t <- graft.Tables.names)
      assert(spark.sql(s"SELECT * FROM $t LIMIT 1").collect().length == 1, t)
  }
}
