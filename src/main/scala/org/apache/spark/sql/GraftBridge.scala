package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 hides the Column ↔ Expression conversions behind
  * `private[sql]`; this bridge re-exports them for graft's custom
  * expressions (same technique as other Spark extension libraries).
  */
object GraftBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** Materializes every output row of the plan (unlike count(), which lets
    * Catalyst prune projection-only plans down to a metadata count) — the
    * honest benchmark action.
    */
  def forceEvaluate(df: Dataset[_]): Long =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.toRdd.count()

  def logicalPlan(df: Dataset[_]): catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  def ofRows(df: Dataset[_],
      plan: catalyst.plans.logical.LogicalPlan): DataFrame = {
    val spark = df.asInstanceOf[classic.Dataset[_]].sparkSession
    classic.Dataset.ofRows(spark, plan)
  }

  /** Registers a planner strategy once per session. */
  def injectStrategy(df: Dataset[_], s: SparkStrategyBridge): Unit = {
    val spark = df.asInstanceOf[classic.Dataset[_]].sparkSession
    if (!spark.experimental.extraStrategies.contains(s))
      spark.experimental.extraStrategies =
        s +: spark.experimental.extraStrategies
  }

  /** Registers a custom optimizer rule once per session. */
  def injectOptimization(
      df: Dataset[_],
      r: catalyst.rules.Rule[catalyst.plans.logical.LogicalPlan]): Unit = {
    val spark = df.asInstanceOf[classic.Dataset[_]].sparkSession
    if (!spark.experimental.extraOptimizations.contains(r))
      spark.experimental.extraOptimizations =
        r +: spark.experimental.extraOptimizations
  }

  def optimizedPlan(df: Dataset[_]): catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.optimizedPlan

  def executedPlan(df: Dataset[_]): execution.SparkPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.executedPlan

  /** Pre-AQE physical plan — where EnsureRequirements has already placed
    * (or elided) the exchanges, before adaptive re-planning wraps stages.
    */
  def sparkPlan(df: Dataset[_]): execution.SparkPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.sparkPlan
}

/** Public alias for the planner Strategy base (package-private-friendly
  * extension point used by graft's custom operators).
  */
abstract class SparkStrategyBridge
    extends org.apache.spark.sql.execution.SparkStrategy
