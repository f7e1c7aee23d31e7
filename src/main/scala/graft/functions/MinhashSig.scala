package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-kernel minhash signature as ONE native codegen Expression:
  * text → whitespace words → n-word shingles → polynomial shingle hash
  * (base 257 mod 2^32, same arithmetic as [[RollingHash]]) → k affine
  * permutation minima — a single tight JVM loop per document with zero
  * intermediate arrays, rows, or digests.
  *
  * This replaces the explode → md5 → groupBy pipeline for signature
  * computation: a narrow map stage with NO shuffle at all (signatures
  * are per-document-local). The earlier nested-HOF attempt was slow
  * because each Catalyst HOF allocates per element; a fused custom
  * Expression has neither that overhead nor the aggregate's exchange.
  *
  * Oracle parity: the polynomial hash replays in DuckDB as
  * `list_reduce` over codepoints and the permutations are inlined
  * literals — see RegistryExt.mhSelects.
  */
object MinhashSig {
  /** Signature worker: k minima of (a_j·h(shingle) + b_j) mod P over
    * all n-word shingles; null when the text has fewer than n words
    * (the explode formulation's "no signature row" dual). */
  def sig(u: UTF8String, n: Int, a: Array[Long], b: Array[Long])
      : ArrayData = {
    val words = u.toString.trim.split("\\s+")
    if (words.length < n) return null
    val k = a.length
    val out = Array.fill(k)(Long.MaxValue)
    val mask = RollingHash.Mask
    var i = 0
    while (i <= words.length - n) {
      // polynomial hash of the shingle "w_i w_{i+1} ... w_{i+n-1}"
      var h = 0L
      var w = 0
      while (w < n) {
        if (w > 0) h = (h * RollingHash.Base + ' ') & mask
        val s = words(i + w)
        var c = 0
        while (c < s.length) {
          h = (h * RollingHash.Base + s.codePointAt(c)) & mask
          c += Character.charCount(s.codePointAt(c))
        }
        w += 1
      }
      var j = 0
      while (j < k) {
        val v = (a(j) * h + b(j)) % Dedup.MinhashPrimeRef
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def minhashSig(c: Column, n: Int, params: IndexedSeq[(Long, Long)])
      : Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(MinhashSigExpr(Bridge.expression(c), n,
      params.map(_._1).toArray, params.map(_._2).toArray))
  }

  /** Local alias so generated code has a stable static path. */
  object Dedup { val MinhashPrimeRef: Long = 4294967291L }
}

case class MinhashSigExpr(child: Expression, n: Int,
                          a: Array[Long], b: Array[Long])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // sig() returns null for NON-null input too (texts with < n words), so
  // nullability must not inherit from the child: with a non-nullable
  // child the default (child.nullable = false) makes nullSafeCodeGen
  // emit `false = value == null` — invalid Java, which killed
  // whole-stage codegen for every stage containing this expression
  // (janino "isNull_X is not an rvalue", observed in the corpus
  // pipeline's fused minhash Project) and, worse, would let the
  // optimizer fold IsNull(sig) to false.
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    MinhashSig.sig(input.asInstanceOf[UTF8String], n, a, b)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", a, "long[]")
    val bRef = ctx.addReferenceObj("mhB", b, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinhashSig.sig($c, $n, $aRef, $bRef);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression)
      : MinhashSigExpr = copy(child = newChild)
  // Array fields: equality by content so plan canonicalization works.
  override def equals(o: Any): Boolean = o match {
    case m: MinhashSigExpr =>
      m.child == child && m.n == n &&
        java.util.Arrays.equals(m.a, a) && java.util.Arrays.equals(m.b, b)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(n),
      Integer.valueOf(java.util.Arrays.hashCode(a)),
      Integer.valueOf(java.util.Arrays.hashCode(b)))
}
