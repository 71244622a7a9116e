package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The two `private[sql]` access points a library-level custom operator
  * needs: build a DataFrame from a hand-constructed [[LogicalPlan]] and
  * extract the Catalyst [[Expression]] behind a public [[Column]]. This
  * is the standard extension-library shim (Delta, Iceberg, and the
  * Spark connectors all carry the same two lines); everything else in
  * graft's planner extension lives in `graft.plans` against public
  * APIs.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  // fully CONVERT the ColumnNode (ExpressionUtils.expression only wraps
  // it lazily — a wrapped Cast reaches codegen as columnnodeexpression
  // and dies with INTERNAL_ERROR)
  def expr(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
