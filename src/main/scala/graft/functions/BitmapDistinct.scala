package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Paged-bitmap EXACT distinct counting — the groupBitmap trick of the
  * columnar OLAP engines (ClickHouse `groupBitmap`, Druid bitmap
  * metrics), expressed as a two-level Spark aggregate:
  *
  *   level 1: `groupBy(key, id >> 12)` — each 4096-id PAGE of the id
  *            domain collapses into a fixed 512-byte bitmap buffer
  *            (this Aggregator), finished as its exact bit count;
  *   level 2: `groupBy(key)` — plain `sum` of the page counts.
  *
  * Why this beats `count(distinct id)` at 100 TB: Spark plans exact
  * count-distinct as a `groupBy(key, id)` de-dup shuffle — ONE ROW PER
  * DISTINCT (key, id) PAIR crosses the exchange (≥16 bytes each). Here
  * the map-side partial aggregation ORs repeats into page bitmaps before
  * the exchange, so the shuffle carries at most one 512-byte blob per
  * (key, page) pair a mapper touched — 1 bit per candidate id. For the
  * dense id spaces this targets (user ids, item ids: billions of ids,
  * heavily repeated), that is a 100×+ shuffle-volume cut; for sparse ids
  * the page split still bounds every buffer at 512 bytes, so memory per
  * group never depends on the id domain. Exact by construction — each id
  * owns one (page, bit) slot; no hashing, no collisions, no error bound.
  */
object BitmapDistinct {
  /** 2^12 ids per page → 64-long (512-byte) buffers. */
  val PageShift = 12
  val PageSize: Int = 1 << PageShift

  /** Arithmetic shift = floorDiv, paired with the masked bit below so
    * negative ids land in a well-defined (page, bit) slot too. */
  def pageOf(id: Column): Column =
    org.apache.spark.sql.functions.shiftright(id, PageShift)
  def bitOf(id: Column): Column =
    id.bitwiseAND(org.apache.spark.sql.functions.lit((PageSize - 1).toLong))
      .cast("int")

  private lazy val agg =
    udaf(new PageBitmapDistinct, Encoders.scalaInt)

  /** `pageDistinct(bitOf($"id"))` under `groupBy(key, pageOf($"id"))`. */
  def pageDistinct(bit: Column): Column = agg(bit)
}

/** Bit-OR aggregator over one page: buffer = 64 longs, reduce sets a
  * bit, merge ORs word-wise, finish pops the count. Runs as an
  * ObjectHashAggregate with map-side partials — the whole point. */
class PageBitmapDistinct extends Aggregator[Int, Array[Long], Long] {
  override def zero: Array[Long] = new Array[Long](BitmapDistinct.PageSize / 64)
  override def reduce(buf: Array[Long], bit: Int): Array[Long] = {
    buf(bit >>> 6) |= 1L << (bit & 63)
    buf
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }
  override def finish(buf: Array[Long]): Long = {
    var n = 0L
    var i = 0
    while (i < buf.length) { n += java.lang.Long.bitCount(buf(i)); i += 1 }
    n
  }
  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
