package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in optimizer rule: rewrite exact `count(DISTINCT x)` aggregates to
  * HyperLogLog++ sketches — the "approximate mode" switch interactive
  * engines ship for dashboard workloads, where a ±2% cardinality is worth
  * avoiding the exact path's cost at scale (Spark plans a single-column
  * distinct count as a two-phase Expand/regroup: every input row is
  * re-shuffled keyed on the distinct value before the final count, while
  * HLL++ partial-aggregates into a constant-size sketch map-side and
  * ships only sketches).
  *
  * STRICTLY opt-in (`spark.graft.approxDistinct=true`, default false) and
  * deliberately narrow: only single-argument, unfiltered COUNT(DISTINCT)
  * rewrites — multi-column distinct counts, filtered aggregates, and
  * every other distinct aggregate (sum/avg DISTINCT) keep exact
  * semantics, because their approximate forms have different error
  * stories and silently changing them is how "approx mode" earns
  * distrust. `spark.graft.approxDistinct.rsd` (default 0.02) sets the
  * target relative standard deviation, with the same bounds as
  * `approx_count_distinct`.
  *
  * Registered through [[GraftExtensions]] (`injectOptimizerRule`) — the
  * full SparkSessionExtensions surface next to the native expressions:
  * the rule composes with every downstream optimization because the
  * rewrite happens in the LOGICAL plan (partial aggregation, AQE, codegen
  * all see an ordinary HLL++ aggregate, exactly as if the user had
  * written `approx_count_distinct`). */
class ApproxDistinctRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.approxDistinct", "false").toBoolean) plan
    else {
      val rsd = conf.getConfString("spark.graft.approxDistinct.rsd", "0.02").toDouble
      plan.transform {
        case agg: Aggregate =>
          agg.transformExpressions {
            case ae @ AggregateExpression(Count(children), _, true, None, _)
                if children.size == 1 =>
              ae.copy(
                aggregateFunction = HyperLogLogPlusPlus(children.head, rsd),
                isDistinct = false)
          }
      }
    }
  }
}
