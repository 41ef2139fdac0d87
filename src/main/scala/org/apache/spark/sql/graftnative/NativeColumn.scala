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

/** `Dataset.ofRows` is likewise `private[sql]` — the only way to turn a
  * hand-built `LogicalPlan` (e.g. a custom operator node) back into a
  * public `DataFrame`.
  */
object PlanDataset {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
