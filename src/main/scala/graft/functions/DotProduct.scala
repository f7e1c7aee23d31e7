package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact BIGINT dot product of two quantized vectors as ONE native
  * codegen Expression — the hot inner kernel of every similarity
  * scorer (brute-force, IVF, LSH, embedding near-dup all pay one dot
  * per candidate pair). Replaces `aggregate(zip_with(a, b, _*_), 0L,
  * _+_)`, which allocates a lambda frame per element; the fused loop
  * is a plain array traversal. The HOF formulation survives as
  * [[graft.operators.Similarity.dotQHof]], spec-pinned equivalent.
  *
  * Oracle parity: same integer arithmetic as the DuckDB
  * `list_sum(list_transform(...))` fragment (RegistryExt.dotSql). */
object DotProduct {
  def dot(a: ArrayData, b: ArrayData): Long = {
    val aa = a.toLongArray()
    val ba = b.toLongArray()
    val n = math.min(aa.length, ba.length)
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += aa(i) * ba(i)
      i += 1
    }
    acc
  }

  def dotQ(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(DotProductExpr(Bridge.expression(a), Bridge.expression(b)))
  }
}

case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DotProduct.dot($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}
