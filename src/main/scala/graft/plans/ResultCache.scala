package graft.plans

import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** cat11 — RESULT CACHE: the third reuse tier of the catalog stack.
  * The MV tier (cat3–cat10) reuses a *declared* summary across many
  * query shapes; exchange reuse (a24) shares a stage *within* one
  * query; the result cache reuses the *finished answer* of a repeated
  * query across executions — the warehouse feature Snowflake ships as
  * the query result cache and Databricks as Delta caching of results.
  *
  * Key = hash(canonicalized optimized plan) × dataset fingerprint.
  * The canonicalized plan normalizes expression ids and carries the
  * source file paths, so two syntactically different but plan-identical
  * queries share an entry, while any change to the computation — or to
  * the data (the fingerprint covers (name, size, mtime) of every file
  * under the dataset dir, the same staleness signal the MV registry
  * trusts) — misses and recomputes. Staleness is therefore impossible
  * by construction: there is no invalidation protocol to get wrong,
  * the key simply changes when the data does (spec-pinned with an
  * mtime-bump fixture).
  *
  * The first execution publishes the result parquet ATOMICALLY (write
  * to a temp dir, rename into place — a racing second writer loses the
  * rename and deletes its temp); every later identical query answers
  * by SCANNING the published result: O(|result|) with zero touches of
  * the fact table and no aggregate in the plan (spec-pinned). At
  * 100 TB this is the dashboard tier — a fleet re-issuing the same
  * daily query all day recomputes exactly once per data refresh, and
  * because the cache lives in the filesystem (not a session memo), it
  * is shared across sessions and survives JVM restarts.
  */
object ResultCache {

  /** (hits, misses) since JVM start — observability for the spec and
    * for a cluster operator judging cache efficacy.
    */
  val hits = new AtomicLong(0)
  val misses = new AtomicLong(0)

  private def planFingerprint(df: DataFrame): String = {
    // withoutRewrite: the defining plan must fingerprint identically
    // whether or not an MV happens to be registered over its source
    val canonical = MatViews.withoutRewrite {
      df.queryExecution.optimizedPlan.canonicalized.toString
    }
    f"${scala.util.hashing.MurmurHash3.stringHash(canonical) & 0xffffffffL}%08x"
  }

  /** Answer `build` from the result cache for dataset `d`, publishing
    * the result on a miss. Returns the cache-backed DataFrame — always
    * a scan of the published parquet, so hit and miss plans are
    * identical downstream.
    */
  def cached(s: SparkSession, d: String)(build: => DataFrame): DataFrame = {
    val q = build
    val key = s"${planFingerprint(q)}_${Tables.datasetFingerprint(d)}"
    val root = Tables.scratchDir("graft_rescache", d)
    val dir = new Path(s"$root/$key")
    val fs = dir.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(dir, "_SUCCESS"))) {
      hits.incrementAndGet()
    } else {
      misses.incrementAndGet()
      val tmp = new Path(s"$root/.tmp-$key-${java.util.UUID.randomUUID()}")
      MatViews.withoutRewrite {
        q.write.mode("overwrite").parquet(tmp.toString)
      }
      // atomic publish: lose the race → our temp is redundant
      if (fs.exists(dir) || !fs.rename(tmp, dir)) fs.delete(tmp, true)
    }
    s.read.parquet(dir.toString)
  }
}
