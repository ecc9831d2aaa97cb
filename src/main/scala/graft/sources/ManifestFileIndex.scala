package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.execution.datasources.{InMemoryFileIndex, PartitionDirectory}

/** src23 — PLAN-INTEGRATED manifest data skipping: the engine-grade form
  * of src22's min/max file pruning. src22 pre-lists surviving files
  * OUTSIDE the optimizer and reads them explicitly, so only that one
  * operator benefits; this `FileIndex` carries per-file (min,max)
  * column stats and intersects them with the PUSHED data filters inside
  * `listFiles`, so ANY query planned over the store — whatever its
  * predicate, whatever tracked column it constrains — prunes files in
  * the plan itself, the way Delta/Iceberg planners consult their
  * manifests (Armbrust et al., VLDB 2020, Delta Lake; the reference has
  * no notion of data skipping — its scans read every SequenceFile
  * split, `ALS/ALS.java:228-237`).
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
  /** Per-file [min,max] for one tracked column, as longs: integral
    * columns carry their values, DateType columns their epoch days
    * (the unit DateType literals compare in).
    */
  final case class ColRange(min: Long, max: Long)

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

/** @param stats per-file, per-tracked-column [min,max] ranges:
  *   normalized file path -> (column name -> range). Any column of any
  *   file may be absent — absence disables skipping for that (file,
  *   column), never correctness.
  */
class ManifestFileIndex(
    spark: SparkSession, root: Path,
    stats: Map[String, Map[String, ManifestFileIndex.ColRange]])
  extends InMemoryFileIndex(spark, Seq(root),
    Map.empty[String, String], None) {

  /** Every column any file carries stats for. */
  private val trackedCols: Seq[String] =
    stats.valuesIterator.flatMap(_.keysIterator).toSeq.distinct.sorted

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val base = super.listFiles(partitionFilters, dataFilters)
    val bounds = trackedCols
      .map(c => c -> ManifestFileIndex.boundsOf(c, dataFilters))
      .filter { case (_, (lo, hi)) =>
        lo != Long.MinValue || hi != Long.MaxValue }
    if (bounds.isEmpty) return base
    base.map { pd =>
      pd.copy(files = pd.files.filter { f =>
        stats.get(f.getPath.toUri.getPath) match {
          case None => true // unknown file: never skip on missing stats
          case Some(colStats) => bounds.forall { case (c, (lo, hi)) =>
            colStats.get(c) match {
              case None => true // untracked column for this file: keep
              case Some(r) => r.max >= lo && r.min <= hi
            }
          }
        }
      })
    }
  }
}
