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

  /** Spark's canonical DIVIDE_BY_ZERO (SQLSTATE 22012) — thrown by the
    * native cosine kernel under ANSI exactly as `Divide` would; the error
    * factory is `private[sql]`, hence this re-export (also called from
    * generated code, so it must stay a static-forwardable method).
    */
  def divideByZeroError(): ArithmeticException =
    errors.QueryExecutionErrors.divideByZeroError(null)
}
