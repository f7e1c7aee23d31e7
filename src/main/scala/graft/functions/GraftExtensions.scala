package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions wiring: exposes the library's native
  * expressions to plain SQL. Activate with
  * `spark.sql.extensions=graft.functions.GraftExtensions` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  *
  * Registered functions:
  *  - `ascii_backslash(str)` — F5 (Form700.py:291-294), the native
  *    codegen Expression in [[AsciiBackslash]].
  *
  * Registered plan surface: the TopK-per-key pushdown
  * ([[graft.plans.TopKPushdown]]) — optimizer Rule rewriting
  * `filter(row_number <= k)` windows into a bounded-heap logical node,
  * plus the planner Strategy with partial/final physical operators.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.asciiBackslashDescriptor)
    ext.injectOptimizerRule(CollapseIdempotent)
    graft.plans.TopKPushdown.register(ext)
  }
}

object GraftExtensions {
  val asciiBackslashDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("ascii_backslash"),
      new ExpressionInfo(classOf[AsciiBackslashExpr].getName,
        "ascii_backslash"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          "ascii_backslash expects exactly one argument")
        AsciiBackslashExpr(children.head)
      })
}
