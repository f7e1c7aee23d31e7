package graft.functions

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: collapse nested applications of the library's
  * idempotent expressions — `ascii_backslash(ascii_backslash(x))` ≡
  * `ascii_backslash(x)` (idempotence is pinned by PropertySpec). The
  * double application arises naturally when catalog-driven cleaning
  * composes with an already-escaped upstream (e.g. a cleaned table
  * re-entering castFields).
  *
  * Registered through [[GraftExtensions]] (`injectOptimizerRule`) — the
  * library's example of extending Catalyst's REWRITE surface, next to
  * its Expression surface (AsciiBackslashExpr, MinNgramHashExpr).
  */
case class CollapseIdempotent(unused: org.apache.spark.sql.SparkSession)
    extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case AsciiBackslashExpr(inner @ AsciiBackslashExpr(_)) => inner
    }
}
