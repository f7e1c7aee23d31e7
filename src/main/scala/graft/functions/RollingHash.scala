package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprinting by polynomial rolling hash: the minimum
  * hash over all `n`-codepoint windows of a string, base 257 modulo
  * 2^32 — O(1) work per position (one multiply-add per slide) instead
  * of one digest per position. Implemented as a native Catalyst
  * `Expression` with `doGenCode`, so the whole fingerprint pass stays
  * inside whole-stage codegen with zero per-row allocation beyond the
  * codepoint array.
  *
  * The mod-2^32 arithmetic (masking) replays exactly in DuckDB SQL via
  * per-window polynomial sums with precomputed power literals
  * ([[RollingHash.powers]]) — the oracle-parity contract. Callers pad
  * inputs shorter than `n` (see TextAnalysis.fingerprint); defensively,
  * a short string hashes as one truncated window.
  */
object RollingHash {
  val Base = 257L
  val Mask = 0xFFFFFFFFL

  /** B^j mod 2^32 for j = 0..n-1 — inlined into the oracle SQL. */
  def powers(n: Int): IndexedSeq[Long] =
    IndexedSeq.iterate(1L, n)(p => (p * Base) & Mask)

  /** Static worker shared by interpreted eval and generated code. */
  def minNgram(u: UTF8String, n: Int): Long = {
    val s = u.toString
    val cps = s.codePoints().toArray
    val len = cps.length
    if (len == 0) return 0L
    var h = 0L
    var i = 0
    if (len < n) {
      while (i < len) { h = (h * Base + cps(i)) & Mask; i += 1 }
      return h
    }
    // B^(n-1) for the slide-out term
    var bTop = 1L
    var k = 1
    while (k < n) { bTop = (bTop * Base) & Mask; k += 1 }
    while (i < n) { h = (h * Base + cps(i)) & Mask; i += 1 }
    var min = h
    while (i < len) {
      h = (((h - ((cps(i - n) * bTop) & Mask)) & Mask) * Base + cps(i)) & Mask
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Column API: `minNgramHash($"text", 8)`. */
  def minNgramHash(c: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(MinNgramHashExpr(Bridge.expression(c), n))
  }
}

case class MinNgramHashExpr(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    RollingHash.minNgram(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingHash.minNgram($c, $n)")
  override protected def withNewChildInternal(newChild: Expression)
      : MinNgramHashExpr = copy(child = newChild)
}
