package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Narrow bridge to two `private[sql]` seams the SQL command layer
  * needs — the same seams every external Spark table format (Delta,
  * Hudi, Iceberg) reaches through a package-placed shim:
  *
  *  - turning an analyzer-produced [[LogicalPlan]] back into a
  *    [[DataFrame]] (`Dataset.ofRows`), so a rewritten `MERGE INTO`'s
  *    already-resolved target/source subtrees can be executed through
  *    the engine's public DataFrame surface, and
  *  - wrapping an already-resolved catalyst [[Expression]] as a
  *    [[Column]] (`ExpressionUtils.column`), so merge conditions and
  *    assignment values keep their resolved attribute ids instead of
  *    being re-resolved by name (which would break on self-merges and
  *    aliased sources).
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
