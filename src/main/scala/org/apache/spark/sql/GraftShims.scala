package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Minimal bridge into `private[sql]` surface: Column <-> Catalyst
 * Expression conversion for graft's native expressions (the conversion
 * became sql-private with Spark 4's column-node API). This is the
 * conventional escape hatch for Spark extension libraries; nothing else
 * private is touched.
 */
object GraftShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a (resolved) logical plan as a DataFrame — the entry point for
    * graft's custom logical operators (e.g. the native as-of join). */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Register a native function into a LIVE session's registry (the
    * extensions path only applies at session construction). */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** `AbstractDataType` is `private[sql]`; re-export the type so graft
    * expressions can declare `inputTypes` for analysis-time checking. */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
