package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** Materialized-view EXACT-MATCH substitution — the engine's third
  * optimizer-tier extension (beside the kernel-fusion rule and the as-of
  * operator tier): a registered daily rollup answers the canonical
  * aggregation over raw events from a CALENDAR-sized table instead of the
  * fact scan. At 100 TB this is the difference between a full-corpus
  * shuffle and reading a few thousand pre-aggregated rows — the classic
  * summary-table pattern (Oracle/Calcite "materialized view rewrite"),
  * done here as exact plan matching: the rewrite fires ONLY when the
  * query's aggregate subtree is canonically identical to the view's
  * defining query, so it can never change semantics.
  *
  * Exactness discipline: the view stores counts and EXACT integer cents
  * (`sum(cast(round(value*100) as bigint))`), so the substituted answer
  * is bit-identical to the raw aggregation — no fp re-aggregation drift —
  * which is what lets the declared query stay fully DuckDB-oracled
  * against the RAW events table while its Spark plan never touches it.
  *
  * Staleness: the staged view is keyed on `datasetFingerprint`, the same
  * memo-invalidations discipline as the IVF/BPE artifacts — a dataset
  * regenerated in place re-stages the view instead of serving stale rows —
  * AND the fingerprint captured at stage time is re-checked at rewrite
  * time, so a registered view whose dataset changed underneath it
  * deregisters itself instead of substituting.
  */
object MatViews {

  /** Rewrite guard: view staging and expected-result computations run
    * with the rule off (also breaks the template-construction recursion).
    * A JVM-global depth counter, not a ThreadLocal: Spark may optimize a
    * plan on a thread other than the caller's (streaming query threads,
    * async actions, AQE re-optimization), and a thread-scoped guard would
    * silently fail there. Globally suppressing the rewrite while any
    * staging/expected-result computation is in flight is always safe —
    * the rule is an optimization, never a semantic requirement.
    */
  private[plans] val bypassDepth = new java.util.concurrent.atomic.AtomicInteger(0)
  private[plans] def bypassed: Boolean = bypassDepth.get() > 0
  def withoutRewrite[T](f: => T): T = {
    bypassDepth.incrementAndGet()
    try f finally bypassDepth.decrementAndGet()
  }

  /** One registered view: its parquet dir, the canonicalized defining
    * plan, the source dataset dir, and the dataset fingerprint captured
    * at stage time — re-checked at rewrite time so an in-place dataset
    * regeneration can never be answered from the stale view.
    */
  private[plans] final case class MvEntry(
      mv: String, template: LogicalPlan, datasetDir: String, fingerprint: String)

  /** canonical events.parquet path -> registered view entry */
  private[plans] val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MvEntry]
  private val staged = new java.util.concurrent.ConcurrentHashMap[String, String]

  def canonicalSrc(d: String): String =
    new java.io.File(s"$d/events.parquet").getAbsolutePath

  /** The canonical daily-rollup shape the rule recognizes: per (day,
    * event_type) the event count and the exact-cents value sum.
    */
  def naiveDailyRollup(s: SparkSession, d: String): DataFrame =
    graft.Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(round(value * 100) as bigint)")).as("cents"))

  /** Stage (memoized) the daily rollup for dataset `d` and register it
    * for rewrite. Returns the view directory.
    */
  def stageDailyRollup(s: SparkSession, d: String): String = {
    val fp = graft.Tables.datasetFingerprint(d)
    val key = s"$d#$fp"
    val mv = graft.Tables.stagedDir(staged, key) { () =>
      val dir = graft.Tables.scratchDir("graft_mv_daily", d)
      withoutRewrite {
        naiveDailyRollup(s, d).write.mode("overwrite").parquet(dir)
      }
      dir
    }
    val template = withoutRewrite {
      naiveDailyRollup(s, d).queryExecution.optimizedPlan.canonicalized
    }
    registry.put(canonicalSrc(d), MvEntry(mv, template, d, fp))
    mv
  }
}

/** The rewrite itself: an `Aggregate` whose single source relation is a
  * registered events table AND whose canonicalized form equals the view's
  * defining plan is replaced by a projection over the view scan, output
  * attributes aliased back to the original exprIds so the parent plan is
  * untouched. Runs inside the operator-optimization fixed point, so by
  * the iteration where the subtree has collapsed to its final shape the
  * comparison is against like forms; after the swap no Aggregate remains,
  * so the rule cannot re-fire on its own output.
  */
object MatViewRewriteRule extends Rule[LogicalPlan] {

  /** The single file-relation root path under `plan`, if exactly one. */
  private def srcPathOf(plan: LogicalPlan): Option[String] =
    plan.collect { case l: LogicalRelation => l } match {
      case Seq(one) => one.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.headOption
          .map(p => new java.io.File(p.toUri.getPath).getAbsolutePath)
        case _ => None
      }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (MatViews.bypassed || MatViews.registry.isEmpty) return plan
    plan.transform {
      case agg: Aggregate =>
        val swapped = for {
          src <- srcPathOf(agg)
          entry <- Option(MatViews.registry.get(src))
          if agg.canonicalized == entry.template
          // Staleness gate: the dataset may have been regenerated in
          // place since staging. The fingerprint is an O(file-stat) walk,
          // paid only after the src + canonical-template match, so it's a
          // rare cost; on mismatch deregister so the stale view can
          // never answer (the next stageDailyRollup re-registers fresh).
          if {
            val fresh = graft.Tables.datasetFingerprint(entry.datasetDir) == entry.fingerprint
            if (!fresh) MatViews.registry.remove(src, entry)
            fresh
          }
          mv = entry.mv
        } yield {
          val s = SparkSession.active
          // one row per (day, event_type) by construction: a plain
          // projection over the view scan IS the aggregate's answer
          val mvPlan = MatViews.withoutRewrite {
            s.read.parquet(mv).select("day", "event_type", "n", "cents")
              .queryExecution.analyzed
          }
          val out: Seq[NamedExpression] =
            agg.output.zip(mvPlan.output).map { case (orig, fromMv) =>
              Alias(fromMv, orig.name)(exprId = orig.exprId)
            }
          Project(out, mvPlan)
        }
        swapped.getOrElse(agg)
    }
  }
}
