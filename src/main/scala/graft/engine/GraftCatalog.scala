package graft.engine

import org.apache.spark.sql.SparkSession

import graft.Tables

/** SQL front-end: registers every test table as a temp view, so a user
  * can type `spark.sql("SELECT ... FROM lineitem")` against the same
  * data every DataFrame operator reads — one catalog, both APIs.
  *
  * Views are zero-cost until queried (a temp view is a named logical
  * plan, not a materialization), and queries through them get the same
  * Catalyst treatment as the DataFrame form — pushdown, pruning, AQE —
  * because they ARE the same plan. `events` goes through
  * [[Tables.events]] so the nanosecond-timestamp normalization is part
  * of the view, not something each SQL user must re-discover.
  *
  * On a cluster the same surface would be a persistent catalog
  * (`saveAsTable` / external metastore); temp views are the
  * session-scoped equivalent with identical query semantics.
  */
object GraftCatalog {

  /** Register all of [[Tables.names]] as temp views over `sfDir`. */
  def register(s: SparkSession, sfDir: String): Unit =
    Tables.names.foreach { n =>
      val df = n match {
        case "events" => Tables.events(s, sfDir)
        case other    => Tables.table(s, sfDir, other)
      }
      df.createOrReplaceTempView(n)
    }
}
