package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ResultCacheSpec extends SparkSpec {

  /** A private store dir (so earlier runs' published entries can't
    * pre-warm it) holding a copy of sf0.001 lineitem.
    */
  private def rmTree(dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  private def freshStore(tag: String): String = {
    val store = graft.Tables.scratchDir(s"graft_cat11_$tag", sf0001)
    rmTree(store)
    graft.Tables.lineitem(spark, sf0001).limit(500)
      .write.mode("overwrite").parquet(s"$store/lineitem.parquet")
    // drop any cache entries a previous run of THIS suite published
    rmTree(graft.Tables.scratchDir("graft_rescache", store))
    store
  }

  private def rollup(store: String) =
    graft.Tables.lineitem(spark, store)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("revenue"))

  test("cat11: second execution answers from the cache scan — no aggregate, no fact touch") {
    val store = freshStore("basic")
    val before = (ResultCache.hits.get(), ResultCache.misses.get())
    ResultCache.cached(spark, store)(rollup(store))
    val hit = ResultCache.cached(spark, store)(rollup(store))
    assert(ResultCache.misses.get() == before._2 + 1, "first call should miss")
    assert(ResultCache.hits.get() == before._1 + 1, "second call should hit")
    val plan = hit.queryExecution.executedPlan.toString
    assert(plan.contains("graft_rescache"), s"plan does not scan the cache:\n$plan")
    assert(!plan.contains("lineitem.parquet"), s"hit plan still reads the fact:\n$plan")
    assert(!plan.contains("HashAggregate"), s"hit plan re-aggregates:\n$plan")
    // the cached answer IS the truth
    val got = hit.orderBy("l_returnflag", "l_linestatus").collect().toSeq
    val raw = rollup(store).orderBy("l_returnflag", "l_linestatus").collect().toSeq
    assert(raw.nonEmpty && got == raw, "cached result diverges from recomputation")
  }

  test("cat11: a data change re-keys the entry — mtime bump misses and recomputes") {
    val store = freshStore("invalidate")
    ResultCache.cached(spark, store)(rollup(store))
    val missesBefore = ResultCache.misses.get()
    // in-place change signal: same name+size, newer mtime (the weakest
    // mutation the fingerprint must still catch)
    val part = new java.io.File(s"$store/lineitem.parquet").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    assert(part.setLastModified(part.lastModified() + 2000))
    ResultCache.cached(spark, store)(rollup(store))
    assert(ResultCache.misses.get() == missesBefore + 1,
      "mtime bump did not invalidate the cache entry")
  }

  test("cat11: plan-identical queries share one entry; a different plan does not") {
    val store = freshStore("keying")
    ResultCache.cached(spark, store)(rollup(store))
    val hitsBefore = ResultCache.hits.get()
    // same computation spelled via SQL-ish expr columns — same canonical plan
    val respelled = graft.Tables.lineitem(spark, store)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("revenue"))
    ResultCache.cached(spark, store)(respelled)
    assert(ResultCache.hits.get() == hitsBefore + 1, "respelled identical plan missed")
    val missesBefore = ResultCache.misses.get()
    val narrower = graft.Tables.lineitem(spark, store)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"))
    ResultCache.cached(spark, store)(narrower)
    assert(ResultCache.misses.get() == missesBefore + 1, "different plan hit")
  }
}
