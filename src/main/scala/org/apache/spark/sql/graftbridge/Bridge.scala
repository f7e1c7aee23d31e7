package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` Spark internals: Column ⇄ Catalyst
  * Expression conversion, needed to expose custom native expressions
  * (e.g. graft.functions.AsciiBackslashExpr) through the public Column
  * API. Lives under org.apache.spark.sql.* solely for access; contains no
  * Spark-derived logic.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
