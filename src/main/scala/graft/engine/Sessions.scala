package graft.engine

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Local-mode defaults are tuned for the test harness (local[32], 128 GiB
  * box) but every setting is chosen to also make sense on a real cluster:
  * AQE on (runtime re-plan, skew-join splitting), shuffle partitions sized
  * to cores locally (on a cluster you'd size to 2-3x total cores or let AQE
  * coalesce), UTC session time zone for deterministic date semantics.
  */
object Sessions {

  /** Shared config applied to any session (local or cluster). */
  def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      // the engine's bucketed writer (Sources.writeBucketed) repartitions
      // on the bucket key before writing, so every bucket holds exactly
      // ONE sorted file — the condition under which a bucketed scan's
      // reported sort order is actually true. With that invariant held,
      // reporting the order lets sort-demanding operators (sort-merge
      // join, the as-of exec) run over bucketed tables with no Sort node
      // at all (pinned in SourcesSpec). Never enable this without the
      // one-file-per-bucket discipline: a multi-file bucket would claim
      // an order it does not have and corrupt merge-join results.
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")

  /** Local session for tests / CLIs. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = configure(
      SparkSession.builder().master(s"local[$cores]").appName("graft"),
      shufflePartitions = cores
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
