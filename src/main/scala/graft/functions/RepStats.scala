package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** All of [[graft.operators.TextAnalysis.repetitionStats]]' per-document
  * counts in ONE native codegen Expression — `(n_words, n_distinct,
  * n_dup_tokens, top_bigram_n, top_bigram)` from a single token walk
  * with two hash maps, replacing a double explode → double shuffle →
  * re-aggregate plan (the same fusion that carried [[MinhashSig]],
  * [[RollingHash]], [[StopwordCounts]] and [[QualityCounts]]: a
  * per-document kernel belongs in one pass on the map side, not in a
  * corpus-wide shuffle).
  *
  * Semantics pinned to the unfused formulation (and the DuckDB oracle):
  *  - tokens = `split(trim(text), "\\s+")` with Spark's trim/split
  *    quirks (0x20-only trim; limit -1 keeps trailing empties);
  *  - the top bigram maximizes (count, gram) exactly like
  *    `max(struct(c, g))`: count first, then the gram in CODEPOINT
  *    order (UTF8 binary order — NOT Java's UTF-16 code-unit order,
  *    which disagrees above the BMP);
  *  - documents with < 2 tokens report `(0, "")` sentinels.
  */
object RepStats {

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  val Schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("n_dup_tokens", LongType, nullable = false),
    StructField("top_bigram_n", LongType, nullable = false),
    StructField("top_bigram", StringType, nullable = false)))

  /** UTF8-binary (= codepoint) order, the StringType sort order. */
  private def utf8Less(a: String, b: String): Boolean =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0

  /** Single-pass worker. */
  def stats(u: UTF8String): InternalRow = {
    val s = u.toString
    var st = 0
    var en = s.length
    while (st < en && s.charAt(st) == ' ') st += 1
    while (en > st && s.charAt(en - 1) == ' ') en -= 1
    val words = Ws.split(s.substring(st, en), -1)

    val wc = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < words.length) {
      wc.merge(words(i), 1L, (a, b) => a + b)
      i += 1
    }
    var nDup = 0L
    val it = wc.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      if (c > 1) nDup += c
    }

    var topN = 0L
    var topG = ""
    if (words.length >= 2) {
      val bc = new java.util.HashMap[String, Long]()
      var j = 0
      while (j < words.length - 1) {
        bc.merge(words(j) + " " + words(j + 1), 1L, (a, b) => a + b)
        j += 1
      }
      val bit = bc.entrySet().iterator()
      while (bit.hasNext) {
        val e = bit.next()
        if (e.getValue > topN ||
          (e.getValue == topN && utf8Less(topG, e.getKey))) {
          topN = e.getValue
          topG = e.getKey
        }
      }
    }
    new GenericInternalRow(Array[Any](words.length.toLong,
      wc.size().toLong, nDup, topN, UTF8String.fromString(topG)))
  }

  def repStats(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(RepStatsExpr(Bridge.expression(c)))
  }
}

case class RepStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = RepStats.Schema

  override def nullSafeEval(input: Any): Any =
    RepStats.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RepStats.stats($c);")

  override protected def withNewChildInternal(newChild: Expression)
      : RepStatsExpr = copy(child = newChild)
}
