package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's custom Catalyst expressions and the public
  * Column API. Spark 4's Column-node refactor removed the
  * `new Column(Expression)` constructor; the supported conversion lives
  * in `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * package-private to org.apache.spark.sql — hence this one-file shim.
  */
object graftsql {
  def columnOf(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Build a DataFrame from a custom logical plan (Dataset.ofRows is
    * package-private) — the construction half of the custom-operator
    * tier: logical node → strategy → physical exec.
    */
  def ofRows(spark: SparkSession,
             plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Idempotently register a planner strategy on a live session (the
    * runtime-registration equivalent of
    * `SparkSessionExtensions.injectPlannerStrategy`).
    */
  def addStrategy(spark: SparkSession, s: execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(s))
      exp.extraStrategies = exp.extraStrategies :+ s
  }
}
