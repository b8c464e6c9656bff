package graft.plans

import org.apache.spark.sql.SparkStrategyBridge
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkPlan

/** Planner strategy mapping the logical AsOfJoinPlan to its physical
  * sort-merge exec (injected via `experimental.extraStrategies` — the
  * standard extension-point pattern).
  */
object AsOfStrategy extends SparkStrategyBridge {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(planLater(p.left), planLater(p.right), p.leftKeys,
        p.rightKeys, p.leftTs, p.rightTs, p.rightValues, p.exact,
        p.toleranceMs) :: Nil
    case _ => Nil
  }
}
