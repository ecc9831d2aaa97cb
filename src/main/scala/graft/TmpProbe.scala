package graft
object TmpProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.engine.Sessions.local()
    val d = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    // parquet aggregate pushdown (v2 reader)
    s.conf.set("spark.sql.parquet.aggregatePushDown", "true")
    val prevV1 = s.conf.get("spark.sql.sources.useV1SourceList")
    println("useV1SourceList=" + prevV1)
    s.conf.set("spark.sql.sources.useV1SourceList", "")
    val agg = s.read.parquet(s"$d/lineitem.parquet")
      .agg(count(lit(1)).as("n"), min("l_shipdate").as("mn"), max("l_shipdate").as("mx"))
    println(agg.queryExecution.executedPlan.toString.take(2500))
    agg.show(false)
    s.conf.set("spark.sql.sources.useV1SourceList", prevV1)
    // runtime bloom filter join
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    s.conf.set("spark.sql.optimizer.runtimeFilter.number.threshold", "10")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ so bloom applies
    val o = s.read.parquet(s"$d/orders.parquet")
    val l = s.read.parquet(s"$d/lineitem.parquet")
    val j = l.join(o.filter(col("o_orderpriority") === "1-URGENT"), col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("n"))
    val pj = j.queryExecution.executedPlan.toString
    println("BLOOM? " + pj.contains("bloom_filter") + " might_contain? " + pj.contains("might_contain"))
    println(pj.take(1200))
    s.stop()
  }
}
