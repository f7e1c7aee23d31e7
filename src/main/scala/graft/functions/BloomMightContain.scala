package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Explicit bloom-filter runtime prefilter — the composable twin of the
  * row-level runtime filters Spark's optimizer injects on its own
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`), exposed here as
  * a first-class operator step so a pipeline can build the sketch once
  * and probe it from any number of downstream scans.
  *
  * Scale design: the BUILD side aggregates distributed (each partition
  * fills a local sketch; partials OR-merge — `DataFrameStatFunctions
  * .bloomFilter` does exactly this), and only the finished ~`1.44 ·
  * n · log2(1/fpp)`-bit array ever reaches the driver — ~10 bits per
  * distinct item at fpp=0.03, orders of magnitude smaller than the
  * broadcast hash relation an exact join would ship. The PROBE side is a
  * whole-stage-codegen'd bitmask test (no hash-table build, no join):
  * rows that fail the probe never reach the exchange. False positives
  * are expected and must be removed by an exact verify step downstream —
  * see `Dedup.decontaminateBloom` for the canonical
  * bloom-prefilter → exact-verify composition whose OUTPUT is exactly
  * the exact path's.
  */
object BloomMightContain {

  /** Serialize a built filter (the form the probe expression carries —
    * bytes, not the live object, so the plan tree stays serializable and
    * canonicalization compares cheap array refs). */
  def toBytes(bf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Distributed build over a string column: partition-local sketches,
    * OR-merged — one narrow aggregate, one tiny driver-side blob. */
  def buildOverStrings(df: DataFrame, colName: String,
                       expectedItems: Long, fpp: Double): Array[Byte] =
    toBytes(df.stat.bloomFilter(colName, expectedItems, fpp))

  /** Column-API probe: `bloomMightContain(bytes, $"g")`. */
  def bloomMightContain(bloomBytes: Array[Byte], c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(BloomMightContainExpr(Bridge.expression(c), bloomBytes))
  }
}

/** Native codegen membership probe: true iff the filter MIGHT contain the
  * UTF-8 bytes of the child string. Spark's `BloomFilter.putString`
  * hashes the UTF-8 encoding, so probing `mightContainBinary(utf8)`
  * avoids materializing a `java.lang.String` per row on the hot path. */
case class BloomMightContainExpr(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression with Predicate {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  /** Instance worker shared by interpreted eval and generated code (the
    * expression itself is the codegen reference object, so the lazily
    * deserialized sketch is built once per task, not per row). */
  def test(s: UTF8String): Boolean = bloom.mightContainBinary(s.getBytes)

  override def dataType: DataType = BooleanType
  override def nullSafeEval(input: Any): Any =
    test(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomMightContainExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.test($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}
