package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Custom optimizer rule: push anchor-side predicates THROUGH the native
  * as-of join. Catalyst's stock filter pushdown doesn't know our node, so
  * without this a `features.filter(anchorPred)` scans and merges every
  * anchor row before discarding — at 10^12 turns that is the difference
  * between reading a partition and reading the table.
  *
  * Safe because each anchor row's match depends only on the right side and
  * its own (key, ts) — dropping anchors never changes other anchors'
  * matches. Right-side predicates are NOT pushable (dropping observations
  * changes which one is "latest").
  */
object AsOfFilterPushdown extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val (pushable, kept) = splitConjunctivePredicates(cond)
        .partition(p =>
          p.deterministic && p.references.subsetOf(j.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val newJoin = j.copy(left = Filter(pushable.reduce(And), j.left))
        kept.reduceOption(And).map(Filter(_, newJoin)).getOrElse(newJoin)
      }
  }
}
