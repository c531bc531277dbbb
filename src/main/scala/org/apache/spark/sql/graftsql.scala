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

  /** Decode a `.asc`/`.desc` sort Column into (child column,
    * descending?, nullsLast?); None for a plain non-sort Column. The
    * internal SortOrder ColumnNode is private[sql], hence here.
    */
  def sortSpec(c: Column): Option[(Column, Boolean, Boolean)] = c.node match {
    case so: internal.SortOrder =>
      Some((new Column(so.child),
        so.sortDirection == internal.SortOrder.Descending,
        so.nullOrdering == internal.SortOrder.NullsLast))
    case _ => None
  }

  /** Normalize floating-point bit patterns (-0.0 → 0.0, all NaNs →
    * the canonical NaN, recursively through struct/array/map types) in
    * an expression used as a GROUPING or SHUFFLE key. The optimizer
    * applies this rule to Aggregate/Window/Join keys only — a CUSTOM
    * key-clustered plan bypasses it and must normalize its own keys or
    * -0.0/0.0 and distinct NaN payloads split groups. The rule object's
    * `normalize` is private[sql], hence surfaced here; it is a no-op
    * (returns `e` untouched) for types that need none.
    */
  def normalizeFloats(e: Expression): Expression =
    catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)

  /** Idempotently register a planner strategy on a live session (the
    * runtime-registration equivalent of
    * `SparkSessionExtensions.injectPlannerStrategy`).
    */
  def addStrategy(spark: SparkSession, s: execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    // The check-then-append below is a read-modify-write on a plain var;
    // serialize it so concurrent callers can't double-register.
    exp.synchronized {
      if (!exp.extraStrategies.contains(s))
        exp.extraStrategies = exp.extraStrategies :+ s
    }
  }
}
