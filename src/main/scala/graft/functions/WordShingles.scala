package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-shingles in ONE native codegen pass — the fused form of
  * `transform(sequence(...), i -> array_join(slice(w, i, n), " "))`,
  * whose per-position `slice` + `array_join` allocations dominated
  * every shingle-exploding plan (dd_decontaminate, tx_ngram_freq).
  * One token split, one StringBuilder walk, optional first-occurrence
  * dedup — then the array explodes downstream exactly as before.
  *
  * Semantics pinned to the HOF formulation (and the DuckDB oracles):
  * Spark `trim` strips 0x20 only; Spark `split` keeps trailing empty
  * tokens (limit -1); fewer than `n` tokens yields an EMPTY array
  * (Spark's `sequence(a, b)` would descend for a > b — the original's
  * explicit guard, reproduced here); `distinct = true` preserves
  * first-occurrence order like `array_distinct`.
  */
object WordShingles {

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Single-pass worker. */
  def shingles(u: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val s = u.toString
    var st = 0
    var en = s.length
    while (st < en && s.charAt(st) == ' ') st += 1
    while (en > st && s.charAt(en - 1) == ' ') en -= 1
    val words = Ws.split(s.substring(st, en), -1)
    if (words.length < n)
      return new GenericArrayData(Array.empty[Any])
    val count = words.length - n + 1
    if (distinct) {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i < count) {
        val sb = new java.lang.StringBuilder()
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(words(i + k))
          k += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size())
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) {
        out(j) = UTF8String.fromString(it.next())
        j += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](count)
      var i = 0
      while (i < count) {
        val sb = new java.lang.StringBuilder()
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(words(i + k))
          k += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  def wordShingles(c: Column, n: Int, distinct: Boolean): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(WordShinglesExpr(Bridge.expression(c), n, distinct))
  }
}

case class WordShinglesExpr(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordShingles.shingles(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.shingles($c, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression)
      : WordShinglesExpr = copy(child = newChild)
}
