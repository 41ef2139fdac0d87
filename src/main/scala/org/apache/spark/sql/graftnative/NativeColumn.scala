package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public Column API and raw Catalyst Expressions.
  *
  * Spark 4 split Column off to a ColumnNode facade; wrapping a custom
  * Catalyst `Expression` into a `Column` (and back) goes through
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]` — so this one-file shim lives in an
  * `org.apache.spark.sql` subpackage (the standard extension-library
  * escape hatch; see SNIPPETS.md [2][3] for the same pattern used by
  * public Spark extension projects). Everything else in this repo stays
  * in the `graft` namespace.
  */
object NativeColumn {
  def wrap(e: Expression): Column = ExpressionUtils.column(e)
  def unwrap(c: Column): Expression = ExpressionUtils.expression(c)
}
