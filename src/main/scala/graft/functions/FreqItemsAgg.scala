package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries/Space-Saving frequent-items CANDIDATE aggregate over a
  * string column (Datasketches `ItemsSketch`), as a native
  * `TypedImperativeAggregate` — the same machinery Spark's own
  * `hll_sketch_agg` runs on: per-partition sketches update in place,
  * partials serialize once per task through the sketch's own serde
  * (never per row), and the final buffer evals to the candidate array
  * under `NO_FALSE_NEGATIVES` — every item whose true count can exceed
  * the sketch's error bound (≤ n/maxMapSize·3.5 by the Datasketches
  * apriori bound) is present.
  *
  * This is a CANDIDATE GENERATOR, not the answer: like the bloom
  * prefilter in `Dedup.decontaminateBloom`, its output must flow into
  * an exact verification (count just the candidates, rank exactly) —
  * see `TextAnalysis.heavyHitters`. The pair is exact whenever the
  * k-th true count clears the sketch error bound, and the sketch side
  * never shuffles more than maxMapSize items per task regardless of
  * vocabulary size.
  */
case class FreqItemsSketchAgg(
    child: Expression,
    maxMapSize: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with UnaryLike[Expression] {

  override def prettyName: String = "freq_items_sketch"
  // (max_error, candidates): the merged sketch's maximum count error
  // rides along so the exact-verify pass can CHECK the heavy-hitters
  // precondition (k-th true count must clear it) instead of silently
  // assuming it.
  override def dataType: DataType = StructType(Seq(
    StructField("max_error", LongType, nullable = false),
    StructField("candidates", ArrayType(StringType), nullable = false)))
  override def nullable: Boolean = false

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String],
                      input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(a: ItemsSketch[String],
                     b: ItemsSketch[String]): ItemsSketch[String] =
    a.merge(b)

  override def eval(buf: ItemsSketch[String]): Any =
    new GenericInternalRow(Array[Any](
      buf.getMaximumError,
      new GenericArrayData(
        buf.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
          .map(r => UTF8String.fromString(r.getItem)))))

  @transient private lazy val serde = new ArrayOfStringsSerDe
  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(serde)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)

  override def withNewMutableAggBufferOffset(o: Int): FreqItemsSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqItemsSketchAgg =
    copy(child = c)
}

object FreqItemsSketchAgg {
  /** Column-API entry: `df.agg(freqItemCandidates($"token", 1024))`. */
  def freqItemCandidates(c: Column, maxMapSize: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(
      FreqItemsSketchAgg(Bridge.expression(c), maxMapSize)
        .toAggregateExpression())
  }
}
