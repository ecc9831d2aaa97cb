package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ⇄ Expression converters.
  *
  * Spark 4 routes the Column API through ColumnNode; building a Column
  * from a custom Catalyst `Expression` goes via
  * `classic.ExpressionUtils`, which is `private[sql]` — this shim lives
  * in the sql package purely to re-export the two converters to graft.
  */
object GraftColumns {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
