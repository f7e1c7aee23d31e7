package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udaf

/** One scored candidate flowing into the top-k heap. Field order is the
  * call-site column order (dot, cand_id, cosine). */
case class ScoredCand(dot: Long, cand_id: Long, cosine: Double)

/** Bounded top-k aggregate: the two-phase exact top-k primitive.
  *
  * `groupBy(query).agg(topK(...))` runs this as a partial-then-final
  * ObjectHashAggregate: every map task reduces its slice of scored rows
  * to a ≤ k-entry buffer PER QUERY before the exchange, so the shuffle
  * on the query key carries O(queries · mapTasks · k) heap entries — not
  * the n·q scored rows a `row_number() OVER (PARTITION BY query)` window
  * shuffles. At 100 TB the window plan funnels the entire scored corpus
  * into q reducer partitions; this plan's reducers merge only
  * already-bounded buffers.
  *
  * Ordering is total and deterministic: dot DESC, then cand_id ASC
  * (cand_id is unique per query), so results are bit-identical to the
  * window formulation and to the SQL oracle's row_number ranking.
  */
class TopKByDot(k: Int)
    extends Aggregator[ScoredCand, Seq[ScoredCand], Seq[ScoredCand]] {

  private def better(a: ScoredCand, b: ScoredCand): Boolean =
    a.dot > b.dot || (a.dot == b.dot && a.cand_id < b.cand_id)

  override def zero: Seq[ScoredCand] = Nil

  // Buffer invariant: sorted best-first, size <= k. The common steady
  // state (full buffer, new row worse than the current k-th) is a single
  // comparison with no allocation.
  override def reduce(buf: Seq[ScoredCand], x: ScoredCand): Seq[ScoredCand] =
    if (buf.size >= k && better(buf.last, x)) buf
    else (buf :+ x).sortWith(better).take(k)

  override def merge(a: Seq[ScoredCand], b: Seq[ScoredCand]): Seq[ScoredCand] =
    (a ++ b).sortWith(better).take(k)

  override def finish(r: Seq[ScoredCand]): Seq[ScoredCand] = r

  override def bufferEncoder = ExpressionEncoder[Seq[ScoredCand]]()
  override def outputEncoder = ExpressionEncoder[Seq[ScoredCand]]()
}

object TopKByDot {
  /** Untyped-aggregation handle: `topK(k)(col("dot"), col("cand_id"),
    * col("cosine"))` inside a `groupBy(...).agg(...)`. */
  def topK(k: Int): UserDefinedFunction =
    udaf(new TopKByDot(k), ExpressionEncoder[ScoredCand]())
}
