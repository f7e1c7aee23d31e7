package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonical-composition pass every
  * text pipeline runs before hashing/dedup (the same logical string
  * can arrive as composed `é` or decomposed `e`+U+0301; un-normalized,
  * exact dedup and minhash treat them as different documents). Spark
  * has no built-in normalizer, so this is a native Catalyst
  * `Expression` over `java.text.Normalizer` (JDK ICU tables) with a
  * static-call codegen body — whole-stage codegen keeps it in the
  * fused text pass, and the quick-check fast path skips already-NFC
  * input (ASCII and most real text) without allocating.
  */
object NfcNormalize {
  /** Static worker invoked from both interpreted and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer
      .normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column-API entry point: `nfcNormalize($"text")`. */
  def nfcNormalize(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(NfcNormalizeExpr(Bridge.expression(c)))
  }
}

case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}
