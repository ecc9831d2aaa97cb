package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.execution.datasources.{InMemoryFileIndex, PartitionDirectory}

/** src23 — PLAN-INTEGRATED manifest data skipping: the engine-grade form
  * of src22's min/max file pruning. src22 pre-lists surviving files
  * OUTSIDE the optimizer and reads them explicitly, so only that one
  * operator benefits; this `FileIndex` carries the per-file (min,max)
  * column stats and intersects them with the PUSHED data filters inside
  * `listFiles`, so ANY query planned over the store — whatever its
  * predicate — prunes files in the plan itself, the way Delta/Iceberg
  * planners consult their manifests (Armbrust et al., VLDB 2020, Delta
  * Lake; the reference has no notion of data skipping — its scans read
  * every SequenceFile split, `ALS/ALS.java:228-237`).
  *
  * Scale shape: the manifest is file-count-sized (16 entries here,
  * O(files) at 100 TB — the same cardinality every table format's
  * planner holds on the driver), the pruning is a per-file interval
  * test, and an un-prunable predicate (or a file missing from the
  * manifest) degrades to reading the file — skipping is only ever an
  * optimization, never a correctness dependency. The declared box query
  * is fully DuckDB-oracled against the raw table, so a wrong skip (a
  * pruned file that held a matching row) breaks the hash; the spec pins
  * the executed plan's numFiles metric to the manifest's survivor count.
  */
object ManifestFileIndex {
  /** Per-file stats: [umin,umax] over `user_id`, [dmin,dmax] over `day`
    * in epoch days (DateType literals compare as epoch-day ints).
    */
  final case class FileStats(umin: Long, umax: Long, dmin: Int, dmax: Int)

  /** Tighten [lo,hi] bounds for `name` from the pushed conjuncts.
    * Conservative by construction: only attribute-vs-literal
    * comparisons tighten; GreaterThan/LessThan tighten to their
    * non-strict bound (keeps a boundary file it could drop — never
    * drops a file it must keep); anything unrecognized is ignored.
    */
  private[sources] def boundsOf(name: String,
      filters: Seq[Expression]): (Long, Long) = {
    def num(l: Literal): Option[Long] = l.value match {
      case i: java.lang.Integer => Some(i.toLong)
      case j: java.lang.Long => Some(j)
      case s: java.lang.Short => Some(s.toLong)
      case _ => None
    }
    var lo = Long.MinValue
    var hi = Long.MaxValue
    def tightenLo(v: Long): Unit = if (v > lo) lo = v
    def tightenHi(v: Long): Unit = if (v < hi) hi = v
    filters.foreach {
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) if a.name == name =>
        num(l).foreach(tightenLo)
      case GreaterThan(a: AttributeReference, l: Literal) if a.name == name =>
        num(l).foreach(tightenLo)
      case LessThanOrEqual(a: AttributeReference, l: Literal) if a.name == name =>
        num(l).foreach(tightenHi)
      case LessThan(a: AttributeReference, l: Literal) if a.name == name =>
        num(l).foreach(tightenHi)
      case EqualTo(a: AttributeReference, l: Literal) if a.name == name =>
        num(l).foreach { v => tightenLo(v); tightenHi(v) }
      case EqualTo(l: Literal, a: AttributeReference) if a.name == name =>
        num(l).foreach { v => tightenLo(v); tightenHi(v) }
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) if a.name == name =>
        num(l).foreach(tightenHi) // lit >= a  ⇒  a <= lit
      case GreaterThan(l: Literal, a: AttributeReference) if a.name == name =>
        num(l).foreach(tightenHi)
      case LessThanOrEqual(l: Literal, a: AttributeReference) if a.name == name =>
        num(l).foreach(tightenLo)
      case LessThan(l: Literal, a: AttributeReference) if a.name == name =>
        num(l).foreach(tightenLo)
      case _ => ()
    }
    (lo, hi)
  }
}

class ManifestFileIndex(
    spark: SparkSession, root: Path,
    stats: Map[String, ManifestFileIndex.FileStats])
  extends InMemoryFileIndex(spark, Seq(root),
    Map.empty[String, String], None) {

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val base = super.listFiles(partitionFilters, dataFilters)
    val (ulo, uhi) = ManifestFileIndex.boundsOf("user_id", dataFilters)
    val (dlo, dhi) = ManifestFileIndex.boundsOf("day", dataFilters)
    if (ulo == Long.MinValue && uhi == Long.MaxValue &&
      dlo == Long.MinValue && dhi == Long.MaxValue) return base
    base.map { pd =>
      pd.copy(files = pd.files.filter { f =>
        stats.get(f.getPath.toUri.getPath) match {
          case None => true // unknown file: never skip on missing stats
          case Some(st) =>
            st.umax >= ulo && st.umin <= uhi &&
              st.dmax.toLong >= dlo && st.dmin.toLong <= dhi
        }
      })
    }
  }
}
