// The Spark 4 public Column API is Connect-agnostic and no longer exposes
// the Catalyst Expression behind a Column; the classic-runtime converters
// (org.apache.spark.sql.classic.ExpressionUtils) are private[sql]. This
// bridge lives in a subpackage of org.apache.spark.sql purely to re-export
// those two conversions to graft code — no Spark internals are modified.
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object ColumnBridge {
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Analyzed logical plan of a DataFrame (classic runtime). */
  def plan(
      df: org.apache.spark.sql.DataFrame
  ): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution
      .analyzed

  /** DataFrame over a custom LogicalPlan (classic runtime) — the
    * entry point a custom operator's Column API needs (Dataset.ofRows
    * is private[sql]).
    */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  ): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      plan
    )
}
