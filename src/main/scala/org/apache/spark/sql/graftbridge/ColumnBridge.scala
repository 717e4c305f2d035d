package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Expression conversions
  * (Spark 4 moved them behind `org.apache.spark.sql.classic`). Lives in
  * the `org.apache.spark.sql` namespace solely to satisfy the access
  * modifier — the one sanctioned way to attach custom Catalyst
  * expressions to the public Column API without a FunctionRegistry
  * round-trip. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager ColumnNode → Expression conversion. [[expression]] wraps a
    * public-API Column in a lazy `ColumnNodeExpression` that only the
    * Dataset construction path unwraps — returned from a
    * FunctionRegistry builder it survives analysis unresolved and
    * fails at codegen. This converts the node tree to real Catalyst
    * expressions up front (builtins become `UnresolvedFunction`s the
    * analyzer DOES resolve), so Column combinators can back SQL-text
    * functions. */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Register an expression builder as a SQL-callable temp function
    * (FunctionRegistry is `private[sql]`, hence this bridge). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Build a DataFrame from a custom LogicalPlan (Dataset.ofRows is
    * `private[sql]`). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Analyzed plan of a DataFrame (queryExecution is classic-side). */
  def analyzed(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed
}
