package graft

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule for the 100 TB "approx mode": when
  * `spark.graft.approxDistinct=true`, every exact distinct count in the
  * plan is rewritten to a HyperLogLog++ sketch aggregate (relative error
  * ~2.3%), turning the dominant exact-distinct shuffle (O(distinct values)
  * state per group) into O(1) sketch merges — the documented alternative
  * for q16/q18/q20/q22-class queries at scale, now a session flag instead
  * of a per-query edit.
  *
  * Installed via `GraftExtensions.install` / `spark.sql.extensions`
  * (injectOptimizerRule) — the rule keeps the AggregateExpression's
  * resultId so downstream attribute references stay bound.
  */
object ApproxDistinctRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.approxDistinct", "false").toBoolean) plan
    else plan.transformAllExpressions {
      case ae @ AggregateExpression(Count(children), _, true, filter, _)
          if children.size == 1 =>
        AggregateExpression(
          HyperLogLogPlusPlus(children.head),
          ae.mode, isDistinct = false, filter, ae.resultId)
    }
}
