package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All of a vector's multi-table LSH sign-bucket keys as ONE native
  * codegen Expression: for each of `numTables` hyperplane tables, the
  * `numPlanes` sign bits of the quantized vector against that table's
  * ±1 planes, concatenated into a bit-string — one tight JVM loop over
  * a flattened plane array with zero intermediate columns.
  *
  * This replaces `array(table0Bucket, ..., table15Bucket)` where each
  * bucket was `concat(CASE WHEN aggregate(zip_with(...)) ...)` —
  * numTables × numPlanes separate Catalyst HOF dot products, each
  * allocating per element. The fused kernel is the same
  * narrow-map-then-posexplode plan shape with the per-row cost of a
  * single array traversal ([[MinhashSig]] precedent: the fused kernel
  * is what makes the narrow stage actually cheap).
  *
  * Oracle parity: planes are deterministic ([[graft.operators
  * .Similarity.planes]], md5-seeded ±1) and the oracle builders embed
  * them as SQL literals — the kernel computes the same exact BIGINT
  * dots, so bucket strings match bit-for-bit.
  */
object LshBuckets {
  /** Bucket worker: q is the quantized vector (BIGINT array), planes is
    * the row-major flattened [table][plane][dim] ±1 array. */
  def buckets(q: ArrayData, planes: Array[Long], numTables: Int,
              numPlanes: Int, dim: Int): ArrayData = {
    val qa = q.toLongArray()
    val d = math.min(dim, qa.length)
    val out = new Array[Any](numTables)
    var t = 0
    var off = 0
    while (t < numTables) {
      val bits = new Array[Byte](numPlanes)
      var j = 0
      while (j < numPlanes) {
        var dot = 0L
        var i = 0
        while (i < d) {
          dot += qa(i) * planes(off + i)
          i += 1
        }
        bits(j) = if (dot >= 0L) '1' else '0'
        off += dim
        j += 1
      }
      out(t) = UTF8String.fromBytes(bits)
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Column builder from the seeded-planes construction: table t draws
    * `Similarity.planes(numPlanes, dim, seed = t)`. */
  def lshBuckets(qvec: Column, numTables: Int, numPlanes: Int,
                 dim: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    val flat = (0 until numTables)
      .flatMap(t => graft.operators.Similarity.planes(numPlanes, dim, t)
        .flatten).toArray
    Bridge.column(LshBucketsExpr(Bridge.expression(qvec), flat,
      numTables, numPlanes, dim))
  }
}

case class LshBucketsExpr(child: Expression, planes: Array[Long],
                          numTables: Int, numPlanes: Int, dim: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    LshBuckets.buckets(input.asInstanceOf[ArrayData], planes,
      numTables, numPlanes, dim)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("lshPlanes", planes, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.LshBuckets.buckets(
         |  $c, $pRef, $numTables, $numPlanes, $dim);
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression)
      : LshBucketsExpr = copy(child = newChild)
  // Array field: equality by content so plan canonicalization works.
  override def equals(o: Any): Boolean = o match {
    case e: LshBucketsExpr =>
      e.child == child && e.numTables == numTables &&
        e.numPlanes == numPlanes && e.dim == dim &&
        java.util.Arrays.equals(e.planes, planes)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(numTables),
      Integer.valueOf(numPlanes), Integer.valueOf(dim),
      Integer.valueOf(java.util.Arrays.hashCode(planes)))
}
