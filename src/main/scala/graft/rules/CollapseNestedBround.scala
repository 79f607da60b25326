package graft.rules

import org.apache.spark.sql.catalyst.expressions.{BRound, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule (SURVEY §4; third leg of the custom-Catalyst triad
  * next to the codegen expressions and the as-of SparkStrategy):
  * `bround(bround(e, n), m)` with `m >= n` is the inner rounding alone —
  * the metric library stacks banker's roundings when a pre-rounded
  * metric (growth/beta, `fetch_data.py:108,124`) flows into a rounded
  * projection (`:265,268`), and the redundant outer call would otherwise
  * cost a BigDecimal round-trip per row in codegen.
  *
  * Soundness: the inner value already has at most n decimal digits, so
  * rounding it at m >= n digits is the identity. (NOT sound for m < n.)
  */
object CollapseNestedBround extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case BRound(inner @ BRound(_, Literal(n: Int, IntegerType), _),
                  Literal(m: Int, IntegerType), _) if m >= n =>
        inner
    }
}
