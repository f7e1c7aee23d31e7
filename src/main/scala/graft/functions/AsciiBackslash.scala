package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** F5 — the reference's `castAscii` (Form700.py:291-294): Python 2
  * `unicode.encode('ascii', 'backslashreplace')` semantics.
  *
  * ASCII chars pass through; U+0080..U+00FF → `\xHH`; U+0100..U+FFFF →
  * `\uHHHH`; supplementary code points → `\UHHHHHHHH`. Implemented as a
  * native Catalyst `Expression` with `doGenCode` (a static-call codegen
  * body) rather than a Scala UDF, so it participates in whole-stage
  * codegen and null handling stays in the engine.
  */
object AsciiBackslash {
  /** Static worker invoked from both interpreted and generated code. */
  def escape(s: UTF8String): UTF8String = {
    val str = s.toString
    // Fast path: pure-ASCII input (the overwhelming majority) is returned
    // as-is without building a new string.
    var ascii = true
    var i = 0
    while (ascii && i < str.length) { if (str.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) return s
    val sb = new java.lang.StringBuilder(str.length + 16)
    var cp = 0
    i = 0
    while (i < str.length) {
      cp = str.codePointAt(i)
      if (cp < 0x80) sb.appendCodePoint(cp)
      else if (cp <= 0xFF) sb.append(f"\\x$cp%02x")
      else if (cp <= 0xFFFF) sb.append(f"\\u$cp%04x")
      else sb.append(f"\\U$cp%08x")
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  /** Column-API entry point: `asciiBackslash($"text")`. */
  def asciiBackslash(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(AsciiBackslashExpr(Bridge.expression(c)))
  }
}

case class AsciiBackslashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    AsciiBackslash.escape(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AsciiBackslash.escape($c)")
  override protected def withNewChildInternal(newChild: Expression): AsciiBackslashExpr =
    copy(child = newChild)
}
