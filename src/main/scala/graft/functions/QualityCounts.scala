package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** All four quality-score counts in ONE native codegen Expression:
  * `[n_chars, n_tokens, n_punct, n_stopwords]` from a single pass —
  * replacing three separate Catalyst passes over the text (a token
  * split + HOF stopword filter, a full `regexp_replace` rebuild for
  * the punctuation count, and the length calls), the same fusion that
  * carried [[MinhashSig]], [[RollingHash]] and [[StopwordCounts]].
  *
  * Semantics are pinned bit-for-bit to the unfused formulation (and so
  * to the unchanged DuckDB oracle):
  *  - `n_chars` = codepoint count (Spark `length`);
  *  - tokens = `split(trim(text), "\\s+")` where Spark's `trim` strips
  *    0x20 ONLY (not Java `String.trim`'s ≤ U+0020) and Spark's
  *    `split` uses limit -1 (trailing empty tokens KEPT — a trailing
  *    tab yields a final `""` token; an empty trimmed string is one
  *    `""` token);
  *  - `n_punct` = codepoints outside `[A-Za-z0-9\s]` with Java-regex
  *    `\s` (the 6 ASCII whitespace chars incl. \x0B) — every non-ASCII
  *    codepoint counts as punctuation, exactly like the regex;
  *  - `n_stopwords` = tokens IN the list (set probe per token).
  */
object QualityCounts {

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  private def isJavaRegexWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' ||
      cp == '\r'

  /** Single-pass worker. */
  def counts(u: UTF8String, stop: java.util.HashSet[String]): ArrayData = {
    val s = u.toString
    // chars + punct in one codepoint walk
    var nChars = 0L
    var nPunct = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      nChars += 1
      val alnum = (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
        (cp >= '0' && cp <= '9')
      if (!alnum && !isJavaRegexWs(cp)) nPunct += 1
      i += Character.charCount(cp)
    }
    // tokens: strip 0x20 only, split with limit -1 (Spark semantics)
    var st = 0
    var en = s.length
    while (st < en && s.charAt(st) == ' ') st += 1
    while (en > st && s.charAt(en - 1) == ' ') en -= 1
    val words = Ws.split(s.substring(st, en), -1)
    var nStop = 0L
    var j = 0
    while (j < words.length) {
      if (stop.contains(words(j))) nStop += 1
      j += 1
    }
    new GenericArrayData(Array(nChars, words.length.toLong, nPunct, nStop))
  }

  def qualityCounts(c: Column, stopwords: Seq[String]): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(QualityCountsExpr(Bridge.expression(c),
      stopwords.toArray))
  }
}

case class QualityCountsExpr(child: Expression, stopwords: Array[String])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any =
    QualityCounts.counts(input.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    // Raw type spelling for Janino (cf. StopwordCounts).
    val setRef = ctx.addReferenceObj("qcStop", stopSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.QualityCounts.counts($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : QualityCountsExpr = copy(child = newChild)

  override def equals(o: Any): Boolean = o match {
    case q: QualityCountsExpr =>
      q.child == child &&
        java.util.Arrays.equals(q.stopwords.asInstanceOf[Array[AnyRef]],
          stopwords.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(
      java.util.Arrays.hashCode(stopwords.asInstanceOf[Array[AnyRef]])))
}
