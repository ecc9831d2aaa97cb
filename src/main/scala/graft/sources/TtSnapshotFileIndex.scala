package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{InMemoryFileIndex, PartitionDirectory}

/** A FileIndex exposing ONE SNAPSHOT of a log-structured (tt) store as a
  * dir-rooted relation: `rootPaths = [table dir]` — so the relation is
  * addressable by the STORE PATH (what the MV-rewrite registry and any
  * path-keyed planner facility key on) — while `listFiles` serves exactly
  * the snapshot's LIVE file set, never superseded batches. This is the
  * table-format read architecture (Delta's `TahoeLogFileIndex` roots at
  * the table and lists from the log) in miniature; the reference has no
  * versioned storage at all (`ALS/ALS.java:312-327` overwrites HDFS dirs
  * in place).
  *
  * Scale shape: the live set is O(files) driver metadata — the same
  * cardinality every table format's planner holds — and partition
  * discovery/pruning work unchanged because the files keep their
  * `day=...` directory layout.
  */
final class TtSnapshotFileIndex(spark: SparkSession, root: Path,
    live: Set[String],
    stats: Map[String, Map[String, ManifestFileIndex.ColStat]] = Map.empty)
  extends InMemoryFileIndex(spark, Seq(root), Map.empty[String, String], None) {

  private val base = root.toUri.getPath

  private def rel(p: Path): String =
    p.toUri.getPath.stripPrefix(base).stripPrefix("/")

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    ManifestFileIndexPrune.prune(
      super.listFiles(partitionFilters, dataFilters)
        .map(pd =>
          pd.copy(files = pd.files.filter(f => live(rel(f.getPath)))))
        .filter(_.files.nonEmpty),
      stats, dataFilters)

  override def inputFiles: Array[String] =
    super.inputFiles.filter(f => live(rel(new Path(f))))

  override def sizeInBytes: Long =
    allFiles().filter(f => live(rel(f.getPath))).map(_.getLen).sum
}
