package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Bridge into `private[sql]` surface for custom Catalyst expressions —
  * the sanctioned pattern for Spark extensions that define native
  * expressions: Column ↔ Expression conversion and SQL function
  * registration live behind `private[sql]` in Spark 4.
  */
object shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Eagerly convert a Column to a Catalyst expression. The lazy
    * `ExpressionUtils.expression` wrapper (ColumnNodeExpression) is only
    * unwrapped by Dataset's own operators — expressions embedded in CUSTOM
    * logical nodes must be converted up front or they reach execution
    * unresolved.
    */
  def expression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)

  /** Analyzed logical plan of a DataFrame (private[sql] surface). */
  def logicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.analyzed

  /** Idempotently install an extra planner strategy on a live session. */
  def addStrategy(spark: SparkSession,
      strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val s = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!s.experimental.extraStrategies.contains(strategy)) {
      s.experimental.extraStrategies = s.experimental.extraStrategies :+ strategy
    }
  }

  /** Build a DataFrame from a logical plan (runs the analyzer). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Register a Catalyst expression builder as a SQL temp function. */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit = {
    import org.apache.spark.sql.classic.ClassicConversions._
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
  }
}
