package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** All language-ID stopword counts in ONE native codegen Expression:
  * text → whitespace tokens → one hash-map probe per token →
  * k per-language counters. Replaces k separate Catalyst
  * `filter(w, isin(...))` HOF passes (each of which re-walks the token
  * array and allocates a filtered copy per language) with a single
  * tight JVM loop and zero intermediate arrays — the same fusion that
  * made [[MinhashSig]] the fastest kernel in the bench.
  *
  * Token semantics match `split(trim(text), "\\s+")` + exact `IN`
  * membership, so the DuckDB oracle (`list_filter(w, t -> t IN (...))`)
  * is unchanged. A token appearing in several languages' lists counts
  * toward each (the map stores all matching language indices).
  */
object StopwordCounts {

  /** Counter worker: one pass over the tokens, one map probe each. */
  def counts(u: UTF8String, lookup: java.util.HashMap[String, Array[Int]],
             k: Int): ArrayData = {
    val out = new Array[Long](k)
    // No .trim here: Java's String.trim strips all chars <= U+0020
    // (wider than the \s+ / oracle space semantics). Leading whitespace
    // just yields one "" token, which never matches the lookup map.
    val words = u.toString.split("\\s+")
    var i = 0
    while (i < words.length) {
      val hit = lookup.get(words(i))
      if (hit != null) {
        var j = 0
        while (j < hit.length) { out(hit(j)) += 1; j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def stopwordCounts(c: Column, lists: Seq[Seq[String]]): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(StopwordCountsExpr(Bridge.expression(c),
      lists.map(_.toArray).toArray))
  }
}

case class StopwordCountsExpr(child: Expression, lists: Array[Array[String]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** token → indices of every language list containing it. */
  @transient private lazy val lookup: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    // distinct per list: a word duplicated WITHIN one language's list
    // must still count each matching token once (IN semantics), not twice.
    for ((ws, i) <- lists.zipWithIndex; w <- ws.distinct) {
      val prev = m.get(w)
      m.put(w, if (prev == null) Array(i)
               else if (prev.contains(i)) prev else prev :+ i)
    }
    m
  }

  override def nullSafeEval(input: Any): Any =
    StopwordCounts.counts(input.asInstanceOf[UTF8String], lookup, lists.length)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    // Raw type: Janino's generics handling is parse-and-erase tolerance,
    // not support — the raw spelling is the robust one (cf. MinhashSig).
    val mapRef = ctx.addReferenceObj("swLookup", lookup,
      "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.StopwordCounts.counts($c, $mapRef, ${lists.length});")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : StopwordCountsExpr = copy(child = newChild)

  // Array fields: equality by content so plan canonicalization and
  // codegen subexpression elimination work.
  override def equals(o: Any): Boolean = o match {
    case s: StopwordCountsExpr =>
      s.child == child && java.util.Arrays.deepEquals(
        s.lists.asInstanceOf[Array[AnyRef]], lists.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(
      java.util.Arrays.deepHashCode(lists.asInstanceOf[Array[AnyRef]])))
}
